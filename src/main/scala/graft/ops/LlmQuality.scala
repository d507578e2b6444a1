package graft.ops

import graft.QueryModule
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Remaining driver-brief LLM-data operators: n-gram Jaccard dedup via
  * PREFIX FILTERING (the AllPairs/PPJoin family — Bayardo et al.,
  * WWW'07 — a different scale path than the MinHash-LSH of
  * q_llm_dedup_fuzzy: exact, no probabilistic recall argument), and
  * per-document quality scoring (length / lexical-diversity / stopword
  * heuristics, the C4/Gopher-style filter stage).
  */
object LlmQuality extends QueryModule {

  private val JaccardT = 0.6

  // ----------------------------------------------------- q_llm_dedup_ngram

  /** Word-4-gram sets per doc (distinct; positional order irrelevant).
    * Gram width matters for the blocking, not just the similarity: this
    * corpus's bigram vocabulary is ~1k (avg doc-frequency ~275 of 5000
    * docs at sf0.1 — measured), which makes ANY bigram-token blocking
    * effectively all-pairs (12.8M candidates). 4-grams push the
    * vocabulary to ~210k with max doc-frequency 6, so prefix buckets
    * hold ≤ a handful of docs (~5k candidate pairs). */
  private def ngrams4(text: Column): Column = {
    val w = split(text, " ")
    val n = size(w)
    when(n >= 4,
      array_distinct(transform(sequence(lit(1), n - 3), i =>
        concat_ws(" ", element_at(w, i), element_at(w, i + 1),
          element_at(w, i + 2), element_at(w, i + 3)))))
      .otherwise(expr("CAST(array() AS ARRAY<STRING>)"))
  }

  /** Exact n-gram Jaccard self-join with prefix filtering.
    *
    * Every doc's bigram set is ordered by a GLOBAL total order —
    * ascending corpus frequency, token as tie-break (rare first). If
    * J(x, y) ≥ t, then |x∩y| ≥ ⌈t·|x|⌉, so the first
    * |x| − ⌈t·|x|⌉ + 1 tokens of x (and symmetrically y) must contain
    * a common token: blocking on prefix tokens finds EVERY qualifying
    * pair, and the exact-Jaccard verification removes every false
    * candidate — output is identical to the all-pairs join the oracle
    * runs, with candidates ~ Σ|token bucket|² over RARE tokens instead
    * of n². At 100 TB the frequency table is vocabulary-bounded and
    * the heavy join never materializes non-candidate pairs. */
  private def dedupNgram(s: SparkSession, d: String): DataFrame = {
    val base = Llm.docs(s, d)
      .select(col("doc_id"), ngrams4(col("text")).as("g"))
      .filter(size(col("g")) >= 1)
    // (doc, token) pairs; tokens are distinct per doc already
    val toks = base.select(col("doc_id"), explode(col("g")).as("tok"))
    val freq = toks.groupBy(col("tok")).agg(count(lit(1)).as("freq"))
    // re-assemble each doc's set in (freq, tok) order; struct sort is
    // field-lexicographic, giving one global order for every doc
    val ordered = toks.join(freq, "tok")
      .groupBy(col("doc_id"))
      .agg(array_sort(collect_list(struct(col("freq"), col("tok"))))
        .as("sorted"))
      .select(col("doc_id"),
        transform(col("sorted"), _.getField("tok")).as("g"))
    val pLen = (size(col("g")) - ceil(lit(JaccardT) * size(col("g"))) + 1)
      .cast("int")
    val prefixToks = ordered
      .select(col("doc_id"), explode(slice(col("g"), lit(1), pLen)).as("tok"))
    val cand = Llm.bucketPairs(prefixToks, Seq(col("tok")), col("doc_id"))
      .select(col("x").as("da"), col("y").as("db"))
    val inter = size(array_intersect(col("ga"), col("gb"))).cast("double")
    cand
      .join(base.select(col("doc_id").as("da"), col("g").as("ga")), "da")
      .join(base.select(col("doc_id").as("db"), col("g").as("gb")), "db")
      .select(col("da"), col("db"),
        Det.r4(inter / (size(col("ga")) + size(col("gb")) - inter))
          .as("jaccard"))
      .filter(col("jaccard") >= JaccardT)
      .orderBy(col("da"), col("db"))
  }

  // ground truth: all-pairs 4-gram Jaccard — fine at oracle scale,
  // exactly the join shape prefix filtering avoids at 100 TB
  private val dedupNgramSql =
    s"""WITH sh AS (
       |  SELECT doc_id,
       |         list_distinct(list_transform(range(1, len(w) - 2),
       |           i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' || w[i+3])) AS g
       |  FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
       |  WHERE len(w) >= 4)
       |SELECT a.doc_id AS da, b.doc_id AS db,
       |       floor((len(list_intersect(a.g, b.g))::DOUBLE /
       |              (len(a.g) + len(b.g) - len(list_intersect(a.g, b.g))))
       |             * 10000 + 0.5) / 10000 AS jaccard
       |FROM sh a JOIN sh b ON a.doc_id < b.doc_id
       |WHERE floor((len(list_intersect(a.g, b.g))::DOUBLE /
       |             (len(a.g) + len(b.g) - len(list_intersect(a.g, b.g))))
       |            * 10000 + 0.5) / 10000 >= $JaccardT
       |ORDER BY da, db""".stripMargin

  // --------------------------------------------------------- q_llm_quality

  private val stopwords =
    Seq("the", "a", "of", "and", "to", "in", "is", "it", "for", "on")

  /** Per-document quality scoring: token count, mean word length
    * (text is single-space-joined, so chars-sans-spaces / tokens),
    * type-token ratio, stopword ratio, a composite score, and a
    * high/medium/low bucket. Pure map-side scan → the classic corpus
    * filter stage; at 100 TB this is one pass, no shuffle. All
    * arithmetic is +,*,/ — portable at the r4 discretization; the
    * bucket label is derived from the ROUNDED score so the two engines
    * can't disagree at a threshold boundary. */
  private def quality(s: SparkSession, d: String): DataFrame = {
    val w = split(col("text"), " ")
    val nTok = size(w).cast("double")
    val ttr = size(array_distinct(w)).cast("double") / nTok
    val stopRatio =
      size(filter(w, x => x.isin(stopwords: _*))).cast("double") / nTok
    val meanWl = (col("n_chars") - (nTok - 1)) / nTok
    val score = Det.r4(least(lit(1.0), nTok / 300.0) *
      (lit(0.4) + lit(0.3) * ttr + lit(0.3) * (lit(1.0) - stopRatio)))
    Llm.docs(s, d)
      .select(col("doc_id"), col("lang"),
        size(w).cast("long").as("n_tokens"),
        Det.r4(meanWl).as("mean_word_len"),
        Det.r4(ttr).as("ttr"),
        Det.r4(stopRatio).as("stopword_ratio"),
        score.as("score"),
        when(score >= 0.5, "high").when(score >= 0.25, "medium")
          .otherwise("low").as("bucket"))
      .orderBy(col("doc_id"))
  }

  private val qualitySql = {
    val in = stopwords.map(s => s"'$s'").mkString(", ")
    s"""WITH m AS (
       |  SELECT doc_id, lang,
       |    len(w)::BIGINT AS n_tokens,
       |    (n_chars - (len(w) - 1))::DOUBLE / len(w) AS mwl,
       |    len(list_distinct(w))::DOUBLE / len(w) AS ttr0,
       |    len(list_filter(w, x -> x IN ($in)))::DOUBLE / len(w) AS sr,
       |    floor(least(1.0, len(w) / 300.0) *
       |          (0.4 + 0.3 * (len(list_distinct(w))::DOUBLE / len(w)) +
       |           0.3 * (1.0 - len(list_filter(w, x -> x IN ($in)))::DOUBLE
       |                        / len(w))) * 10000 + 0.5) / 10000 AS score
       |  FROM (SELECT doc_id, lang, n_chars, string_split(text, ' ') AS w
       |        FROM documents))
       |SELECT doc_id, lang, n_tokens,
       |  floor(mwl * 10000 + 0.5) / 10000 AS mean_word_len,
       |  floor(ttr0 * 10000 + 0.5) / 10000 AS ttr,
       |  floor(sr * 10000 + 0.5) / 10000 AS stopword_ratio,
       |  score,
       |  CASE WHEN score >= 0.5 THEN 'high'
       |       WHEN score >= 0.25 THEN 'medium' ELSE 'low' END AS bucket
       |FROM m ORDER BY doc_id""".stripMargin
  }

  // -------------------------------------------------------------- registry

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_llm_dedup_ngram" -> (dedupNgram _),
    "q_llm_quality" -> (quality _),
  )

  val oracles: Map[String, String] = Map(
    "q_llm_dedup_ngram" -> dedupNgramSql,
    "q_llm_quality" -> qualitySql,
  )
}
