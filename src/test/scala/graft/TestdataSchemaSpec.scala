package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the engine-facing schema of every driver-generated table.
  *
  * The driver regenerates /root/testdata between rounds and has
  * already changed physical types once (events.ts: INT64 nanos →
  * timestamp[us], which broke 22 queries mid-round before
  * Tables.events became type-adaptive). This spec makes any future
  * regeneration that shifts a column's engine-facing type fail
  * `sbt test` immediately with the exact column named, instead of
  * surfacing as a pile of downstream DATATYPE_MISMATCH errors or —
  * worse — silently wrong streaming windows.
  *
  * events is asserted POST-normalization (Tables.events), which is
  * the type contract the 123 queries compile against; by design it
  * holds for both ts encodings the testdata has shipped with. The
  * raw encodings themselves are covered by EventsEncodingSpec.
  */
class TestdataSchemaSpec extends AnyFunSuite {
  private lazy val s = SparkTestBase.spark

  private val expected = Map(
    "region" -> "r_regionkey int, r_name string",
    "nation" -> "n_nationkey int, n_name string, n_regionkey int",
    "customer" -> ("c_custkey bigint, c_name string, c_nationkey int, " +
      "c_acctbal double, c_mktsegment string"),
    "supplier" -> ("s_suppkey bigint, s_name string, s_nationkey int, " +
      "s_acctbal double"),
    "part" -> ("p_partkey bigint, p_name string, p_brand string, " +
      "p_type string, p_size int, p_retailprice double"),
    "orders" -> ("o_orderkey bigint, o_custkey bigint, " +
      "o_orderstatus string, o_totalprice double, " +
      "o_orderdate timestamp_ntz, o_orderpriority string"),
    "lineitem" -> ("l_orderkey bigint, l_partkey bigint, " +
      "l_suppkey bigint, l_linenumber int, l_quantity double, " +
      "l_extendedprice double, l_discount double, l_tax double, " +
      "l_returnflag string, l_linestatus string, " +
      "l_shipdate timestamp_ntz"),
    "documents" -> ("doc_id bigint, text string, lang string, " +
      "source string, n_chars bigint"),
    "embeddings" -> "vec_id bigint, embedding array<float>, label int")

  private def render(df: org.apache.spark.sql.DataFrame): String =
    df.schema.fields
      .map(f => s"${f.name} ${f.dataType.sql.toLowerCase}")
      .mkString(", ")

  for ((name, ddl) <- expected.toSeq.sortBy(_._1))
    test(s"testdata schema pinned: $name") {
      val got = render(Tables.t(s, SparkTestBase.sfDir, name))
      assert(got == ddl,
        s"\nDriver testdata regeneration changed $name's engine-facing " +
        s"schema.\n  expected: $ddl\n  got     : $got\nAudit every " +
        "query touching the changed column (and Tables adaptivity for " +
        "encoding flips) before re-pinning.")
    }

  test("testdata schema pinned: events (post Tables.events)") {
    val got = render(Tables.events(s, SparkTestBase.sfDir))
    val ddl = "event_id bigint, ts timestamp, user_id bigint, " +
      "event_type string, value double, props string"
    assert(got == ddl,
      s"\nevents' engine-facing schema drifted.\n  expected: $ddl\n" +
      s"  got     : $got\nTables.events must normalize any shipped ts " +
      "encoding to TimestampType (see EventsEncodingSpec).")
  }
}
