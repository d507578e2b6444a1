package graft

import graft.sources.Normalize
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen

/** SURVEY §5 property: normalize is TOTAL on arbitrary nested-null
  * raw inputs — any combination of present/absent/null fields yields
  * exactly one canonical row (never a throw, never a dropped record),
  * with the error channel engaged iff the record is invalid. The
  * Spark analogue of the reference's quickcheck properties over
  * arbitrarily nested hashes (hash.rkt:110-140). */
class NormalizePropertySpec extends AnyFunSuite {
  private lazy val s = SparkTestBase.spark

  private val word: Gen[String] = Gen.alphaNumStr.map(_.take(12))
  private def opt[T](g: Gen[T]): Gen[Option[T]] = Gen.option(g)

  private def field(name: String, v: Option[String], quote: Boolean = true) =
    v.map(x => if (quote) s""""$name": "$x"""" else s""""$name": $x""")

  // (line, idPresent) — id presence tracked from the generator, not
  // re-derived by substring probing (a VALUE could be the string "id")
  private val meetupLine: Gen[(String, Boolean)] = for {
    id <- opt(word)
    link <- opt(word)
    time <- opt(Gen.chooseNum(0L, 2000000000000L))
    off <- opt(Gen.chooseNum(-43200000L, 43200000L))
    name <- word // keep name present so error messages are well-formed
    desc <- opt(word)
    hasVenue <- Gen.oneOf(true, false)
    vName <- opt(word)
    vCity <- opt(word)
    nPhotos <- Gen.chooseNum(-1, 3) // -1 = photo_album absent
  } yield {
    val venue = if (hasVenue)
      Some(s""""venue": {${Seq(field("name", vName), field("city", vCity))
        .flatten.mkString(", ")}}""")
    else None
    val photos = if (nPhotos >= 0)
      Some(s""""photo_album": {"photo_sample": [${
        (0 until nPhotos).map(i => s"""{"photo_link": "p$i"}""").mkString(", ")}]}""")
    else None
    val line = (Seq(field("chapter", Some("propch")), field("id", id),
      field("link", link),
      field("time", time.map(_.toString), quote = false),
      field("utc_offset", off.map(_.toString), quote = false),
      field("name", Some(name)), field("description", desc))
      .flatten ++ venue ++ photos).mkString("{", ", ", "}")
    (line, id.isDefined)
  }

  test("property: meetup normalize is total and error iff id is null") {
    val gen = Gen.listOfN(200, meetupLine).sample.getOrElse(Nil)
    assert(gen.nonEmpty)
    val lines = gen.map(_._1)
    import s.implicits._
    val raw = s.read.schema(Normalize.meetupRawSchema)
      .json(s.createDataset(lines))
    val out = Normalize.normalizeMeetup(raw).cache()
    // total: one output row per input line, schema exact
    assert(out.count() == lines.length)
    assert(out.schema == Normalize.canonicalSchema)
    // error channel engaged exactly for null ids
    val nullIds = gen.count(!_._2)
    assert(out.filter(col("error").isNotNull).count() == nullIds)
    // masked rows: error rows carry no payload
    assert(out.filter(col("error").isNotNull && col("url").isNotNull)
      .count() == 0)
    // photos default: rows without error always have a (possibly empty)
    // photos array — reference get-in default '() (meetup.rkt:55)
    assert(out.filter(col("error").isNull && col("photos").isNull)
      .count() == 0)
    out.unpersist()
  }
}
