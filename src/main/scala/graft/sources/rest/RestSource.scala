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
  * partition fetches its chapter's page from the adapter's endpoint
  * and emits (chapter, adapter, payload-line) rows for the normalize
  * pipeline to consume.
  *
  * The fetch goes through the [[Transport]] seam: a live deployment
  * registers an HTTP implementation (`meetup.rkt:83-84`,
  * `facebook.rkt:81-83`, `eventbrite.rkt:113-114`); this container is
  * zero-egress, so the default `fixture` transport serves the
  * committed fixture captures — exactly the reference's own test
  * strategy (`eventbrite.rkt:123-146` replays a captured API page).
  * The fixture file is parsed and chapter-indexed ONCE per JVM
  * ([[FixtureIndex]]), not re-read per partition.
  *
  * Rate limiting (A6, `meetup.rkt:9-26`) is two-layer:
  *  - a token bucket per executor JVM caps requests/second, shared
  *    across that executor's partitions — the Spark restatement of the
  *    reference's per-worker throttle boxes;
  *  - response-header feedback: when a response reports
  *    `X-Ratelimit-Remaining` < 3, the JVM defers every subsequent
  *    fetch until `X-Ratelimit-Reset` — the reference's sleep-on-low
  *    loop (meetup.rkt:15-24), applied JVM-wide.
  *
  * Usage:
  * {{{
  *   spark.read.format("graft.sources.rest.RestSource")
  *     .option("chaptersFile", ".../chapters.jsonl")
  *     .option("fixturesDir", ".../fixtures")     // offline transport
  *     .option("transport", "fixture")            // or a registered name
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

/** One adapter-page fetch result. `rateRemaining`/`rateResetMillis`
  * carry the reference's `X-Ratelimit-Remaining` / `X-Ratelimit-Reset`
  * headers (meetup.rkt:12-13) when the transport surfaces them. */
case class RestResponse(lines: Seq[String],
                        rateRemaining: Option[Long] = None,
                        rateResetMillis: Option[Long] = None)

/** The fetch seam (A3–A5). Implementations: [[FixtureTransport]]
  * (default, offline), or anything registered via
  * [[Transport.register]] — an HTTP client in a live deployment, a
  * mock in tests. Registration is per-JVM: on a cluster, register from
  * an executor plugin (or ship the implementation on the classpath and
  * register lazily); in local mode the driver registration suffices. */
trait Transport {
  def fetch(adapter: String, chapter: String): RestResponse
}

object Transport {
  private val registry =
    new java.util.concurrent.ConcurrentHashMap[String, Transport]()

  def register(name: String, t: Transport): Unit = registry.put(name, t)

  /** `fixture` → offline replay; an `http(s)://...` base URL → live
    * [[HttpTransport]]; anything else → the per-JVM registry. */
  def resolve(name: String, fixturesDir: String): Transport =
    if (name == "fixture") new FixtureTransport(fixturesDir)
    else if (name.startsWith("http://") || name.startsWith("https://"))
      new HttpTransport(name)
    else Option(registry.get(name)).getOrElse(sys.error(
      s"graft-rest: unknown transport '$name' — register it with " +
        "graft.sources.rest.Transport.register(name, impl)"))
}

/** Live HTTP transport (the reference's simple-http GET of
  * `/{api-id}/events`, meetup.rkt:83-86): fetches
  * `{base}/{adapter}/{chapter}/events` with the JDK's built-in
  * java.net.http client (no extra dependency), expects a
  * newline-delimited JSON body, and surfaces the
  * `X-Ratelimit-Remaining` / `X-Ratelimit-Reset` headers
  * (meetup.rkt:19-24; Reset is epoch SECONDS, converted to the millis
  * deadline [[Throttle]] expects). Non-2xx fails loudly — the error
  * row lift happens in the normalize layer, not by swallowing fetch
  * failures (the reference's exn handlers at meetup.rkt:74-80 do the
  * same lift one level up). Exercised in RestSourceSpec against a
  * loopback HttpServer; the container has no egress, so that test IS
  * the live-mode proof. */
class HttpTransport(baseUrl: String,
                    maxRetries: Int = HttpTransport.DefaultMaxRetries,
                    backoffMs: Long = HttpTransport.DefaultBackoffMs)
  extends Transport {
  override def fetch(adapter: String, chapter: String): RestResponse = {
    // path segments percent-encoded: a chapter id with a space would
    // crash URI.create, and one containing '/' would silently rewrite
    // the request path
    def seg(v: String): String =
      java.net.URLEncoder.encode(v, "UTF-8").replace("+", "%20")
    val req = java.net.http.HttpRequest.newBuilder()
      .uri(java.net.URI.create(
        s"${baseUrl.stripSuffix("/")}/${seg(adapter)}/${seg(chapter)}/events"))
      // per-ATTEMPT timeout: with retries the wedged-endpoint worst
      // case is (maxRetries+1) × this + the backoff sum, so it is
      // sized to keep the total bounded in tens of seconds (see
      // DefaultMaxRetries); the reference's event payloads are KB-NDJSON
      .timeout(java.time.Duration.ofSeconds(15))
      .GET().build()
    // transient failures → bounded exponential backoff + retry
    // (verdict r12 #8): production REST ingest sees rolling restarts
    // and gateway hiccups; one blip per chapter must not cost the
    // row. A restart surfaces as EITHER a gateway 5xx OR a
    // connection-level IOException (connect refused, timeout) — both
    // retry (review r13: the first cut only retried received 5xx
    // responses, missing the commonest restart symptom). 4xx never
    // retries (the request itself is wrong — retrying a 404 just
    // burns the rate limit), and exhausted retries fail loudly so the
    // normalize layer's exception→error-row lift (A9) records the
    // chapter, same as the reference's exn handlers one level up.
    def send(): Either[java.io.IOException, java.net.http.HttpResponse[String]] =
      try Right(HttpTransport.client.send(req,
        java.net.http.HttpResponse.BodyHandlers.ofString()))
      catch {
        case e: java.io.IOException => Left(e)
        case e: InterruptedException => throw e
      }
    var attempt = 0
    var last = send()
    def transient(r: Either[java.io.IOException, java.net.http.HttpResponse[String]]) =
      r.fold(_ => true, _.statusCode() / 100 == 5)
    while (transient(last) && attempt < maxRetries) {
      Thread.sleep(backoffMs << attempt) // backoff, 2^attempt
      attempt += 1
      last = send()
    }
    val resp = last match {
      case Left(e) => throw new java.io.IOException(
        s"graft-rest: ${e.getMessage} fetching $adapter/$chapter from " +
          s"$baseUrl after $attempt retries", e)
      case Right(r) => r
    }
    if (resp.statusCode() / 100 != 2)
      sys.error(s"graft-rest: HTTP ${resp.statusCode()} fetching " +
        s"$adapter/$chapter from $baseUrl" +
        (if (attempt > 0) s" after $attempt retries" else ""))
    def hdr(n: String): Option[String] = {
      val v = resp.headers().firstValue(n)
      if (v.isPresent) Some(v.get) else None
    }
    RestResponse(
      // \r?\n: a CRLF-delimited NDJSON body would otherwise leave a
      // trailing \r on every payload line (review r12)
      resp.body().split("\r?\n").toSeq.filter(_.trim.nonEmpty),
      hdr("X-Ratelimit-Remaining").flatMap(_.toLongOption),
      hdr("X-Ratelimit-Reset").flatMap(_.toLongOption).map(_ * 1000L))
  }
}

object HttpTransport {
  /** 3 retries × doubling backoff from 500 ms ≈ 3.5 s of waiting per
    * chapter — enough to ride out a rolling restart. Worst-case
    * latency before the error-row lift fires: connect-REFUSED fails
    * each attempt instantly (≈ 3.5 s total); a WEDGED endpoint
    * (accepts, never responds) burns the 15 s per-attempt request
    * timeout, 4 × 15 + 3.5 ≈ 64 s — bounded around the single-attempt
    * minute the pre-retry transport already risked, never multiplied
    * into minutes (tests pass a ms-scale backoff). */
  val DefaultMaxRetries = 3
  val DefaultBackoffMs = 500L

  /** One client per JVM: connection pooling across all partitions on
    * an executor instead of a fresh selector thread + TCP handshake
    * per fetch. Connect/request timeouts bound a stalled server —
    * without them a wedged endpoint hangs the Spark task forever. */
  private lazy val client = java.net.http.HttpClient.newBuilder()
    .connectTimeout(java.time.Duration.ofSeconds(20))
    .build()
}

/** Offline transport: replays committed fixture captures, the
  * reference's own test strategy. Delegates to the per-JVM
  * [[FixtureIndex]] so each raw_<adapter>.jsonl is read and parsed
  * once, not once per chapter partition. */
class FixtureTransport(fixturesDir: String) extends Transport {
  override def fetch(adapter: String, chapter: String): RestResponse =
    RestResponse(FixtureIndex.lines(s"$fixturesDir/raw_$adapter.jsonl", chapter))
}

/** Per-JVM chapter index over fixture files: path → (chapter → lines).
  * The r3 reader re-read and re-JSON-parsed the whole file in every
  * chapter partition — O(chapters × file size); this parses once. */
private[rest] object FixtureIndex {
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[String, Map[String, Vector[String]]]()

  def lines(path: String, chapter: String): Seq[String] =
    // a MISSING file is not cached: computeIfAbsent would pin the
    // empty result forever, hiding a fixture created later in the
    // JVM's lifetime (the pre-index reader re-checked every read)
    if (!java.nio.file.Files.exists(java.nio.file.Paths.get(path)))
      Vector.empty
    else cache.computeIfAbsent(path, load).getOrElse(chapter, Vector.empty)

  private val load: java.util.function.Function[String, Map[String, Vector[String]]] =
    (path: String) => {
      val p = java.nio.file.Paths.get(path)
      if (!java.nio.file.Files.exists(p)) Map.empty
      else {
        // real JSON parse per line (jackson ships with Spark) — a regex
        // probe would false-match field VALUES containing "chapter":...
        val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
        java.nio.file.Files.readAllLines(p).asScala.iterator
          .filter(_.trim.nonEmpty)
          .flatMap { line =>
            Option(mapper.readTree(line).get("chapter"))
              .map(c => c.asText -> line)
          }
          .toVector.groupMap(_._1)(_._2)
      }
    }
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
            props.getOrElse("transport", "fixture"),
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
                                       transport: String,
                                       fixturesDir: String,
                                       ratePerSecond: Double)
  extends InputPartition

private[rest] class RestReaderFactory extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    new RestReader(p.asInstanceOf[RestPartition])
}

/** Per-executor rate limiting (A6). One state per JVM — every
  * partition on an executor shares the budget, like the reference's
  * per-worker throttle state (`meetup.rkt:9-10` boxes). */
private[graft] object Throttle {
  // one bucket per rate so concurrent scans with different configured
  // rates don't fight over shared state
  private val buckets =
    scala.collection.mutable.HashMap.empty[Long, (Double, Long)] // rate-> (tokens, lastNanos)

  /** JVM-wide defer deadline from response-header feedback
    * (meetup.rkt:15-24: when the api reports <3 requests remaining,
    * sleep until the reset time). Updated under the lock: a bare
    * volatile read-modify-write would let a concurrent smaller
    * deadline overwrite a larger one and resume fetching early. */
  @volatile private var deferUntilMillis = 0L

  def noteHeaders(resp: RestResponse): Unit =
    if (resp.rateRemaining.exists(_ < 3)) synchronized {
      deferUntilMillis = math.max(deferUntilMillis,
        resp.rateResetMillis.getOrElse(System.currentTimeMillis() + 1000L))
    }

  /** Test hook: clear the defer deadline so a suite that plants one
    * can't leak a sleep into unrelated tests in the shared JVM. */
  private[graft] def clearDefer(): Unit = synchronized {
    deferUntilMillis = 0L
  }

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
    var hdrWait = deferUntilMillis - System.currentTimeMillis()
    while (hdrWait > 0) {
      Thread.sleep(hdrWait)
      hdrWait = deferUntilMillis - System.currentTimeMillis()
    }
    var wait = tryAcquire(ratePerSecond)
    while (wait > 0) { Thread.sleep(wait); wait = tryAcquire(ratePerSecond) }
  }
}

private[rest] class RestReader(p: RestPartition)
  extends PartitionReader[InternalRow] {

  /** The API fetch for this chapter, through the [[Transport]] seam;
    * throttled before, header-feedback recorded after. */
  private lazy val lines: Iterator[String] = {
    Throttle.acquire(p.ratePerSecond) // one fetch per partition
    val resp = Transport.resolve(p.transport, p.fixturesDir)
      .fetch(p.adapter, p.chapter)
    Throttle.noteHeaders(resp)
    resp.lines.iterator
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
