package graft.sources.rest

import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.unsafe.types.UTF8String
import java.util
import scala.jdk.CollectionConverters._

/** DataSourceV2 connector for the reference's REST ingest (SURVEY §2A
  * A3–A6): one input partition per chapter — the reference's unit of
  * parallel work (`api-runner.rkt:152-168` chunks the chapter list
  * across 3 worker threads; Spark's scheduler replaces the thread
  * pool, so the connector only declares the partitioning). Each
  * partition "fetches" its chapter's page from the adapter's endpoint
  * and emits (chapter, adapter, payload-line) rows for the normalize
  * pipeline to consume.
  *
  * The fetch itself goes through [[Transport]]: a live deployment
  * implements it with an HTTP client (`meetup.rkt:83-84`,
  * `facebook.rkt:81-83`, `eventbrite.rkt:113-114`); this container is
  * zero-egress, so the default transport serves the committed fixture
  * captures — exactly the reference's own test strategy
  * (`eventbrite.rkt:123-146` replays a captured API page).
  *
  * Rate limiting (A6, `meetup.rkt:9-26`): a token bucket per executor
  * JVM, shared across that executor's partitions — the Spark
  * restatement of the reference's per-worker throttle boxes. The
  * reference sleeps when the api says <3 requests remain; the bucket
  * enforces an requests/second ceiling before each fetch.
  *
  * Usage:
  * {{{
  *   spark.read.format("graft.sources.rest.RestSource")
  *     .option("chaptersFile", ".../chapters.jsonl")
  *     .option("fixturesDir", ".../fixtures")     // offline transport
  *     .option("ratePerSecond", "100")
  *     .load()
  * }}}
  */
class RestSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    RestSource.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new RestTable(properties.asScala.toMap)
}

object RestSource {
  val schema: StructType = StructType.fromDDL(
    "chapter STRING, adapter STRING, payload STRING")
}

private[rest] class RestTable(props: Map[String, String])
  extends Table with SupportsRead {
  override def name(): String = "graft_rest"
  override def schema(): StructType = RestSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new RestScanBuilder(props ++ options.asScala)
}

private[rest] class RestScanBuilder(props: Map[String, String])
  extends ScanBuilder with Scan with Batch {
  override def build(): Scan = this
  override def readSchema(): StructType = RestSource.schema
  override def toBatch: Batch = this

  /** One partition per chapter (api-runner.rkt:152-155 prepares one
    * work item per chapter; chunking across workers is Spark's
    * scheduler's job now). The chapter list is read on the driver,
    * like read-chapter-json (api-runner.rkt:171-178). */
  override def planInputPartitions(): Array[InputPartition] = {
    val chaptersFile = props.getOrElse("chaptersfile",
      sys.error("graft-rest: option 'chaptersFile' is required"))
    val lines = java.nio.file.Files.readAllLines(
      java.nio.file.Paths.get(chaptersFile)).asScala
    // real JSON parse (jackson ships with Spark) — a regex probe would
    // false-match field VALUES containing the text "chapter": "..."
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    lines.filter(_.trim.nonEmpty).flatMap { line =>
      val node = mapper.readTree(line)
      (Option(node.get("chapter")), Option(node.get("adapter"))) match {
        case (Some(c), Some(a)) =>
          Some(RestPartition(c.asText, a.asText,
            props.getOrElse("fixturesdir", ""),
            props.getOrElse("ratepersecond", "100").toDouble))
        case _ => None
      }
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new RestReaderFactory
}

private[rest] case class RestPartition(chapter: String, adapter: String,
                                       fixturesDir: String,
                                       ratePerSecond: Double)
  extends InputPartition

private[rest] class RestReaderFactory extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    new RestReader(p.asInstanceOf[RestPartition])
}

/** Per-executor token bucket (A6). One bucket per JVM — every
  * partition on an executor shares the budget, like the reference's
  * per-worker throttle state (`meetup.rkt:9-10` boxes). */
private[rest] object Throttle {
  // one bucket per rate so concurrent scans with different configured
  // rates don't fight over shared state
  private val buckets =
    scala.collection.mutable.HashMap.empty[Long, (Double, Long)] // rate-> (tokens, lastNanos)

  /** Try to take a token; returns 0 on success or the suggested sleep
    * millis. Never sleeps inside the lock — other readers keep making
    * progress while a throttled one waits. */
  private def tryAcquire(rate: Double): Long = synchronized {
    val key = java.lang.Double.doubleToLongBits(rate)
    val now = System.nanoTime()
    val (tokens0, last) = buckets.getOrElse(key, (rate, now))
    val tokens = math.min(rate, tokens0 + (now - last) / 1e9 * rate)
    if (tokens >= 1.0) { buckets(key) = (tokens - 1.0, now); 0L }
    else { buckets(key) = (tokens, now); math.max(1L, (1000 / rate).toLong) }
  }

  def acquire(ratePerSecond: Double): Unit = {
    var wait = tryAcquire(ratePerSecond)
    while (wait > 0) { Thread.sleep(wait); wait = tryAcquire(ratePerSecond) }
  }
}

private[rest] class RestReader(p: RestPartition)
  extends PartitionReader[InternalRow] {

  /** The "API fetch" for this chapter. Live mode would be an HTTP GET
    * of the adapter's endpoint; offline it replays the captured page
    * from fixtures, filtered to this partition's chapter. */
  private lazy val lines: Iterator[String] = {
    Throttle.acquire(p.ratePerSecond) // one fetch per partition
    val path = java.nio.file.Paths.get(s"${p.fixturesDir}/raw_${p.adapter}.jsonl")
    // real JSON parse per line — formatting-independent and immune to
    // values that merely contain the text "chapter": "..."
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    if (!java.nio.file.Files.exists(path)) Iterator.empty
    else java.nio.file.Files.readAllLines(path).asScala.iterator
      .filter { line =>
        line.trim.nonEmpty &&
          Option(mapper.readTree(line).get("chapter"))
            .exists(_.asText == p.chapter)
      }
  }

  private var current: String = _
  override def next(): Boolean =
    if (lines.hasNext) { current = lines.next(); true } else false
  override def get(): InternalRow =
    InternalRow(UTF8String.fromString(p.chapter),
      UTF8String.fromString(p.adapter),
      UTF8String.fromString(current))
  override def close(): Unit = ()
}
