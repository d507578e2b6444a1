package graft.ops

import graft.{QueryModule, Tables => T}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Two more training-data pipeline stages: PII detection/redaction
  * (the pre-training scrub every public corpus pipeline runs — C4,
  * Dolma and RefinedWeb all regex-scrub emails/phones) and per-label
  * embedding centroids (the k-means "update" step that trains the IVF
  * codebook q_llm_sim_ann probes).
  */
object LlmPipe extends QueryModule {

  // --------------------------------------------------------------- q_llm_pii

  /** Regex PII scrub. The documents corpus is synthetic lowercase
    * prose with no planted PII, so the query first APPENDS a
    * deterministic contact line derived from doc_id (both engines
    * derive the identical string — this stays a pure function of the
    * input table, not hand-made data), then detects and redacts it:
    * email + phone counts, redacted length, and the redacted tail as
    * evidence. Patterns stick to RE2-∩-Java syntax (character
    * classes, +, {n} — no lookarounds) so Spark and DuckDB compile
    * the same automaton. Map-side scan; at 100 TB this fuses into
    * whatever pass already reads the text (codegen'd regexes, no
    * shuffle, no UDF). */
  private def pii(s: SparkSession, d: String): DataFrame = {
    val email = "[a-z0-9]+@[a-z]+\\.[a-z]+"
    val phone = "\\+1-555-[0-9]{4}"
    val contact = concat(col("text"),
      lit(" contact user"), col("doc_id"), lit("@example.com or +1-555-"),
      lpad((col("doc_id") % 10000).cast("string"), 4, "0"),
      // every third doc gets a second address → n_emails varies
      when(col("doc_id") % 3 === 0,
        concat(lit(" cc admin"), col("doc_id"), lit("@example.org")))
        .otherwise(lit("")))
    Llm.docs(s, d)
      .select(col("doc_id"),
        size(regexp_extract_all(contact, lit(email), lit(0)))
          .cast("long").as("n_emails"),
        size(regexp_extract_all(contact, lit(phone), lit(0)))
          .cast("long").as("n_phones"),
        regexp_replace(regexp_replace(contact, lit(email), lit("[EMAIL]")),
          lit(phone), lit("[PHONE]")).as("red"))
      .select(col("doc_id"), col("n_emails"), col("n_phones"),
        length(col("red")).cast("long").as("n_chars_redacted"),
        // right() has no Scala-functions binding — SQL fragment over
        // the named column
        expr("right(red, 48)").as("tail"))
      .orderBy(col("doc_id"))
  }

  private val piiSql =
    """WITH c AS (
      |  SELECT doc_id,
      |         text || ' contact user' || doc_id || '@example.com or +1-555-'
      |           || lpad((doc_id % 10000)::VARCHAR, 4, '0')
      |           || CASE WHEN doc_id % 3 = 0
      |                   THEN ' cc admin' || doc_id || '@example.org'
      |                   ELSE '' END AS t
      |  FROM documents),
      |r AS (
      |  SELECT doc_id, t,
      |         regexp_replace(regexp_replace(t,
      |           '[a-z0-9]+@[a-z]+\.[a-z]+', '[EMAIL]', 'g'),
      |           '\+1-555-[0-9]{4}', '[PHONE]', 'g') AS red
      |  FROM c)
      |SELECT doc_id,
      |       len(regexp_extract_all(t, '[a-z0-9]+@[a-z]+\.[a-z]+'))::BIGINT
      |         AS n_emails,
      |       len(regexp_extract_all(t, '\+1-555-[0-9]{4}'))::BIGINT
      |         AS n_phones,
      |       length(red)::BIGINT AS n_chars_redacted,
      |       right(red, 48) AS tail
      |FROM r ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------- q_llm_centroid

  /** Per-label embedding centroids, one row per (label, dimension) —
    * the aggregation a k-means / IVF codebook trainer runs every
    * iteration. posexplode unpivots the 64-dim vectors to
    * (label, dim, component) and ONE hash aggregation averages each
    * cell: shuffle volume is |labels|·dims rows of partial sums
    * (map-side combine), independent of corpus size — the canonical
    * 100 TB-safe shape for vector reductions. Components are
    * discretized at 1e-6: both engines sum the same float-widened
    * doubles in different orders, agreeing to ~1e-13. */
  private def centroid(s: SparkSession, d: String): DataFrame =
    T.par(s, T.embeddings(s, d))
      .select(col("label"), posexplode(col("embedding")))
      .groupBy(col("label"), (col("pos") + 1).as("dim"))
      .agg(count(lit(1)).as("n_vecs"),
        Det.r6(avg(col("col").cast("double"))).as("c"))
      .orderBy(col("label"), col("dim"))

  private val centroidSql =
    s"""SELECT label, i::INT AS dim, count(*) AS n_vecs,
       |       ${Det.sql6("avg(embedding[i])")} AS c
       |FROM embeddings, range(1, 65) t(i)
       |GROUP BY label, i ORDER BY label, dim""".stripMargin

  // -------------------------------------------------------- q_llm_dedup_cc

  /** Connected components over the near-dup pair graph — the step
    * that turns pairwise dedup output (simhash Hamming ≤ 3 edges,
    * shared with q_llm_dedup_simhash) into KEEPER GROUPS: every doc
    * in a component is a near-dup of the others via some chain, and
    * a pipeline keeps min(doc_id) per component. Implementation is
    * hash-min label propagation — each node's label converges to the
    * component's min id in O(diameter) rounds, each round ONE shuffle
    * join (labels → neighbors) + ONE min-aggregation, the same layout
    * GraphX's connectedComponents deploys. Near-dup components have
    * tiny diameter (dup chains, not paths), so 3–4 rounds close; the
    * loop is capped and the cap is asserted. localCheckpoint after
    * each round truncates lineage (iterative plans otherwise double
    * per round); at cluster scale this is a reliable checkpoint to
    * the DFS instead. The driver-side loop carries only a one-row
    * convergence probe per round, never data.
    *
    * The oracle clusters the SAME edges by transitive closure in a
    * recursive CTE (min reachable id per node) — tractable at oracle
    * scale, exactly what hash-min avoids materializing at 100 TB. */
  private def dedupCc(s: SparkSession, d: String): DataFrame = {
    val pairs = LlmExt.simhashPairs(s, d).select(col("da"), col("db"))
    val edges = pairs
      .union(pairs.select(col("db"), col("da")))
      .toDF("src", "dst")
      .localCheckpoint()
    var labels = edges.select(col("src").as("id")).distinct()
      .select(col("id"), col("id").as("lbl"))
      .localCheckpoint()
    var converged = false
    var rounds = 0
    val MaxRounds = 20
    while (!converged && rounds < MaxRounds) {
      val nbr = edges.join(labels, edges("src") === labels("id"))
        .select(col("dst").as("id"), col("lbl"))
      val next = labels.union(nbr)
        .groupBy(col("id")).agg(min(col("lbl")).as("lbl"))
        .localCheckpoint()
      val changed = next.join(labels.withColumnRenamed("lbl", "prev"), "id")
        .filter(col("lbl") =!= col("prev")).limit(1).count()
      labels = next
      converged = changed == 0L
      rounds += 1
    }
    require(converged, s"hash-min did not converge in $MaxRounds rounds")
    val sizes = labels.groupBy(col("lbl"))
      .agg(count(lit(1)).as("cluster_size"))
    labels.join(sizes, "lbl")
      .select(col("id").as("doc_id"), col("lbl").as("cluster"),
        col("cluster_size"))
      .orderBy(col("doc_id"))
  }

  private val dedupCcSql =
    s"""WITH RECURSIVE ${LlmExt.simhashFpsCtes},
       |e AS (
       |  SELECT a.doc_id AS a, b.doc_id AS b
       |  FROM fps a JOIN fps b ON a.doc_id < b.doc_id
       |  WHERE bit_count(xor(a.fp, b.fp)) <= 3),
       |u AS (SELECT a, b FROM e UNION ALL SELECT b, a FROM e),
       |r AS (
       |  SELECT a AS id, a AS reach FROM u
       |  UNION
       |  SELECT r.id, u.b FROM r JOIN u ON r.reach = u.a),
       |c AS (SELECT id, min(reach) AS cluster FROM r GROUP BY id)
       |SELECT id AS doc_id, cluster,
       |       count(*) OVER (PARTITION BY cluster)::BIGINT AS cluster_size
       |FROM c ORDER BY doc_id""".stripMargin

  // -------------------------------------------------------------- registry

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_llm_pii" -> (pii _),
    "q_llm_centroid" -> (centroid _),
    "q_llm_dedup_cc" -> (dedupCc _),
  )

  val oracles: Map[String, String] = Map(
    "q_llm_pii" -> piiSql,
    "q_llm_centroid" -> centroidSql,
    "q_llm_dedup_cc" -> dedupCcSql,
  )
}
