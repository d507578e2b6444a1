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

  // -------------------------------------------------------------- registry

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_llm_pii" -> (pii _),
    "q_llm_centroid" -> (centroid _),
  )

  val oracles: Map[String, String] = Map(
    "q_llm_pii" -> piiSql,
    "q_llm_centroid" -> centroidSql,
  )
}
