package graft.ops

import graft.QueryModule
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Corpus-statistics operators for the training-data pipeline (round
  * 7): line-level boilerplate detection (the CCNet/Dolma cleaning
  * stage that runs BEFORE content dedup) and PMI collocation
  * extraction (the phrase-mining / tokenizer-vocabulary pass).
  *
  * Both are corpus-global statistics with the same scale contract as
  * the rest of the LLM family: one corpus-linear explode, counts
  * aggregated with map-side combine, global scalars carried as
  * broadcast 1-row frames (never a partition-less window, never a
  * driver collect).
  */
object LlmCorpus extends QueryModule {

  // ------------------------------------------------------ q_llm_boilerplate

  private val LineTokens = 10

  /** Line-level boilerplate detection — the cleaning stage web-corpus
    * pipelines (CCNet §3.1's paragraph dedup, Dolma's paragraph-level
    * filters) run before any content dedup: a "line" occurring in many
    * documents is nav/footer chrome, not content, and dropping it both
    * shrinks the corpus and stops boilerplate from gluing unrelated
    * docs together in the fuzzy-dedup stage.
    *
    * The documents table has no newlines, so pseudo-lines are
    * deterministic [[LineTokens]]-token chunks, plus one PLANTED
    * footer line appended per doc as a pure function of doc_id%7
    * (the q_llm_pii / q_llm_dedup_url in-query synthesis pattern):
    * 7 distinct footers, each shared by ~1/7 of the corpus, so the
    * detector has real signal at every SF while body chunks stay
    * (almost) unique.
    *
    * Shape: explode to distinct (doc, line) → line doc-frequency via
    * count-over-(partition line) window ON THE SAME FRAME (the tfidf
    * no-join-back trick: one shuffle on line both counts and marks
    * carrier rows) → map-side-combined per-doc reduce. The corpus doc
    * count rides in as a broadcast 1-row aggregate. Boilerplate cut:
    * df ≥ max(ceil(5% of docs), 5) — the floor keeps tiny-SF exact-dup
    * groups (df 2–4) out of the boilerplate class; both engines
    * evaluate the identical integer-valued threshold. Shuffle volume
    * is |distinct lines| short strings; production would md5/xxhash
    * lines to 8 bytes first (the dedupNgram trade) — same shape. */
  private def boilerplate(s: SparkSession, d: String): DataFrame = {
    val docs = Llm.docs(s, d)
    // body chunks: tokens [i·L+1, i·L+L], i = 0 .. (n_tok-1)/L
    val bodyLines = expr(
      s"""transform(
         |  sequence(0, cast((size(split(text, ' ')) - 1) / $LineTokens as int)),
         |  i -> array_join(slice(split(text, ' '), i * $LineTokens + 1, $LineTokens), ' '))"""
        .stripMargin)
    val footer = concat(lit("subscribe to site"), col("doc_id") % 7,
      lit(" newsletter daily digest"))
    val lines = docs
      .select(col("doc_id"),
        explode(concat(bodyLines, array(footer))).as("line"))
      .distinct() // line frequency = DOC frequency, not occurrence count
    val n = docs.agg(count(lit(1)).as("n_docs"))
    val byLine = Window.partitionBy(col("line"))
    val cut = greatest(ceil(col("n_docs") * lit(0.05)), lit(5L))
    val frac = col("n_boiler").cast("double") / col("n_lines")
    lines
      .withColumn("df", count(lit(1)).over(byLine))
      .crossJoin(broadcast(n))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_lines"),
        sum(when(col("df") >= cut, 1L).otherwise(0L)).as("n_boiler"))
      .select(col("doc_id"), col("n_lines"), col("n_boiler"),
        Det.r4(frac).as("boiler_frac"))
      .orderBy(col("doc_id"))
  }

  private val boilerplateSql =
    s"""WITH t AS (
       |  SELECT doc_id, string_split(text, ' ') AS w FROM documents),
       |l AS (
       |  SELECT DISTINCT doc_id, line FROM (
       |    SELECT doc_id,
       |           unnest(list_append(
       |             list_transform(range(0, (len(w) - 1) // $LineTokens + 1),
       |               i -> array_to_string(
       |                      w[i * $LineTokens + 1 : i * $LineTokens + $LineTokens],
       |                      ' ')),
       |             'subscribe to site' || (doc_id % 7) ||
       |             ' newsletter daily digest')) AS line
       |    FROM t)),
       |nn AS (SELECT count(*) AS n_docs FROM documents),
       |f AS (
       |  SELECT doc_id, count(*) OVER (PARTITION BY line) AS df
       |  FROM l)
       |SELECT doc_id, count(*) AS n_lines,
       |       sum(CASE WHEN df >= greatest(ceil(nn.n_docs * 0.05), 5)
       |                THEN 1 ELSE 0 END)::BIGINT AS n_boiler,
       |       ${Det.sql4(
            "sum(CASE WHEN df >= greatest(ceil(nn.n_docs * 0.05), 5) " +
            "THEN 1 ELSE 0 END)::DOUBLE / count(*)")} AS boiler_frac
       |FROM f CROSS JOIN nn
       |GROUP BY doc_id ORDER BY doc_id""".stripMargin

  // ------------------------------------------------------------ q_llm_colloc

  private val MinPairCount = 5
  private val TopK = 20

  /** PMI collocation extraction (Church & Hanks 1990) — the corpus-
    * statistics pass phrase mining and tokenizer-vocabulary induction
    * run over a training corpus: adjacent-token pairs whose joint
    * frequency far exceeds the independence prediction,
    * PMI = ln(n_xy·N / (n_x·n_y)), reported for the top-[[TopK]] pairs
    * above a [[MinPairCount]] support floor (raw PMI is dominated by
    * hapax noise without one).
    *
    * Shape at 100 TB: bigram counts are one corpus-linear transform +
    * map-side-combined hash agg (shuffle = |distinct bigrams| ≤
    * vocab²); the unigram table is vocabulary-bounded (Heaps' law) so
    * it BROADCASTS onto the bigram frame twice — the bigram frame
    * never shuffles again — and the corpus token total rides the same
    * broadcast as a 1-row frame. The final cut is orderBy().limit() →
    * TakeOrderedAndProject, a distributed partial top-K. Cross-engine
    * determinism: PMI is a pure function of integer counts through
    * libm ln (the tfidf argument), r6-discretized, with (w1, w2) as
    * the total-order tie-break. */
  private def colloc(s: SparkSession, d: String): DataFrame = {
    val toks = Llm.docs(s, d)
      .select(split(col("text"), " ").as("w"))
      .filter(size(col("w")) >= 2)
    val bigrams = toks
      .select(explode(expr(
        "transform(sequence(1, size(w) - 1), " +
          "i -> struct(element_at(w, i) AS w1, element_at(w, i + 1) AS w2))"))
        .as("bg"))
      .select(col("bg.w1").as("w1"), col("bg.w2").as("w2"))
      .groupBy(col("w1"), col("w2"))
      .agg(count(lit(1)).as("n_xy"))
      .filter(col("n_xy") >= MinPairCount)
    val uni = toks.select(explode(col("w")).as("t"))
      .groupBy(col("t")).agg(count(lit(1)).as("cnt"))
    val n = toks.select(explode(col("w")).as("t"))
      .agg(count(lit(1)).as("n_tok"))
    val pmi = Det.r6(log(
      (col("n_xy").cast("double") * col("n_tok")) /
        (col("n_x").cast("double") * col("n_y"))))
    bigrams
      .join(broadcast(uni.select(col("t").as("w1"), col("cnt").as("n_x"))),
        "w1")
      .join(broadcast(uni.select(col("t").as("w2"), col("cnt").as("n_y"))),
        "w2")
      .crossJoin(broadcast(n))
      .select(col("w1"), col("w2"), col("n_xy"), col("n_x"), col("n_y"),
        pmi.as("pmi"))
      .orderBy(col("pmi").desc, col("w1"), col("w2"))
      .limit(TopK)
  }

  private val collocSql =
    s"""WITH t AS (
       |  SELECT string_split(text, ' ') AS w FROM documents
       |  WHERE len(string_split(text, ' ')) >= 2),
       |bg AS (
       |  SELECT g, count(*) AS n_xy FROM (
       |    SELECT unnest(list_transform(range(1, len(w)),
       |                    i -> w[i] || ' ' || w[i+1])) AS g
       |    FROM t)
       |  GROUP BY g HAVING count(*) >= $MinPairCount),
       |sp AS (
       |  SELECT string_split(g, ' ')[1] AS w1, string_split(g, ' ')[2] AS w2,
       |         n_xy
       |  FROM bg),
       |uni AS (
       |  SELECT tk, count(*) AS cnt FROM (SELECT unnest(w) AS tk FROM t)
       |  GROUP BY tk),
       |nn AS (SELECT count(*) AS n_tok FROM (SELECT unnest(w) FROM t))
       |SELECT w1, w2, n_xy, ux.cnt AS n_x, uy.cnt AS n_y,
       |       ${Det.sql6(
            "ln(n_xy::DOUBLE * nn.n_tok / (ux.cnt::DOUBLE * uy.cnt))")}
       |         AS pmi
       |FROM sp JOIN uni ux ON sp.w1 = ux.tk
       |        JOIN uni uy ON sp.w2 = uy.tk CROSS JOIN nn
       |ORDER BY pmi DESC, w1, w2 LIMIT $TopK""".stripMargin

  // -------------------------------------------------------------- registry

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_llm_boilerplate" -> (boilerplate _),
    "q_llm_colloc" -> (colloc _),
  )

  val oracles: Map[String, String] = Map(
    "q_llm_boilerplate" -> boilerplateSql,
    "q_llm_colloc" -> collocSql,
  )
}
