package graft.sources

import java.util.{Map => JMap}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.types.{IntegerType, StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** Per-page fetch contract for [[HttpPageSource]]. Implementations MUST be
  * top-level classes with a no-arg constructor: the source ships only the
  * class NAME to executors and instantiates per partition — nothing fetched
  * or captured on the driver, no closure serialization.
  *
  * A fetch failure must be returned as a status, never thrown: the source's
  * contract is the reference's skip-and-continue
  * (`/root/reference/download_lambda.py:39-43`).
  */
trait PageFetcher {
  /** @return (http status, body); body ignored unless status == 200. */
  def fetch(url: String): (Int, String)
}

/** Real-network fetcher with the reference's browser headers
  * (`download_lambda.py:13-19`). Any I/O error → status -1 row, keeping the
  * PERMISSIVE contract (one dead page never fails the job). Not exercised
  * against the network in tests (offline image); the production default.
  */
final class JavaNetPageFetcher extends PageFetcher {
  override def fetch(url: String): (Int, String) =
    try {
      val conn = new java.net.URL(url).openConnection()
        .asInstanceOf[java.net.HttpURLConnection]
      conn.setRequestProperty("User-Agent", "Mozilla/5.0")
      conn.setRequestProperty("Accept-Language", "en-US,en;q=0.9")
      conn.setConnectTimeout(10000)
      conn.setReadTimeout(30000)
      val status = conn.getResponseCode
      val body =
        if (status == 200)
          new String(conn.getInputStream.readAllBytes(), java.nio.charset.StandardCharsets.UTF_8)
        else null
      (status, body)
    } catch { case _: Exception => (-1, null) }
}

/** DataSourceV2 `TableProvider` for the reference's paginated HTTP scan
  * (SURVEY.md §2.A R1, the scale form of the `for page in range(1, 11)`
  * loop at `download_lambda.py:36-43`): one `InputPartition` per page
  * RANGE, so a 1M-page crawl fans out across executors with bounded
  * partition count, instead of a driver-side loop.
  *
  * Options:
  *   - `urlTemplate` (required): URL with a `{page}` placeholder.
  *   - `pages`: total page count, default 10 (the reference's range).
  *   - `firstPage`: first page number, default 1.
  *   - `pagesPerPartition`: range size per InputPartition, default 2.
  *   - `fetcher`: [[PageFetcher]] implementation class name, default
  *     [[JavaNetPageFetcher]] — tests inject a fixture fetcher here so the
  *     network is never touched.
  *
  * Output schema: (url, page, status, body) — PERMISSIVE: a non-200 page is
  * an ERROR ROW (body null, status kept), never an exception. `filter(status
  * = 200)` downstream reproduces `tests/test_download.py:103-116` (page 5
  * 404s; the run still succeeds with partial results).
  *
  * Usage:
  * {{{
  * spark.read.format("graft.sources.HttpPageSource")
  *   .option("urlTemplate", "https://example.com/search?page={page}")
  *   .option("pages", "10").load()
  * }}}
  */
class HttpPageSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    HttpPageSource.schema

  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: JMap[String, String]): Table =
    new HttpPageTable(properties.asScala.toMap)
}

object HttpPageSource {
  val schema: StructType = StructType(Seq(
    StructField("url", StringType, nullable = false),
    StructField("page", IntegerType, nullable = false),
    StructField("status", IntegerType, nullable = false),
    StructField("body", StringType, nullable = true)))
}

private[sources] class HttpPageTable(props: Map[String, String])
    extends Table with SupportsRead {
  override def name(): String = s"http_pages(${props.getOrElse("urltemplate", "?")})"
  override def schema(): StructType = HttpPageSource.schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new HttpPageScan(props)
    }
}

private[sources] class HttpPageScan(props: Map[String, String]) extends Scan with Batch {
  private def opt(name: String): Option[String] =
    props.collectFirst { case (k, v) if k.equalsIgnoreCase(name) => v }

  private val template = opt("urlTemplate").getOrElse(
    throw new IllegalArgumentException("HttpPageSource requires option urlTemplate (with a {page} placeholder)"))
  private val pages = opt("pages").map(_.toInt).getOrElse(10)
  private val firstPage = opt("firstPage").map(_.toInt).getOrElse(1)
  private val perPart = math.max(1, opt("pagesPerPartition").map(_.toInt).getOrElse(2))
  private val fetcherClass = opt("fetcher").getOrElse(classOf[JavaNetPageFetcher].getName)

  override def readSchema(): StructType = HttpPageSource.schema
  override def toBatch: Batch = this

  override def planInputPartitions(): Array[InputPartition] =
    (firstPage until firstPage + pages by perPart).map { start =>
      PageRangePartition(template, start,
        math.min(start + perPart - 1, firstPage + pages - 1), fetcherClass): InputPartition
    }.toArray

  override def createReaderFactory(): PartitionReaderFactory = HttpPageReaderFactory
}

/** A contiguous page range — the unit of fetch parallelism. */
private[sources] case class PageRangePartition(
    template: String, start: Int, end: Int, fetcherClass: String) extends InputPartition

private[sources] object HttpPageReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[PageRangePartition]
    new PartitionReader[InternalRow] {
      // Instantiated HERE, on the executor — the fetcher (and any sockets /
      // caches it holds) never exists on the driver.
      private val fetcher =
        Class.forName(p.fetcherClass).getDeclaredConstructor().newInstance()
          .asInstanceOf[PageFetcher]
      private var page = p.start - 1
      private var row: InternalRow = _

      override def next(): Boolean = {
        page += 1
        if (page > p.end) return false
        val url = p.template.replace("{page}", page.toString)
        val (status, body) =
          try fetcher.fetch(url) catch { case _: Exception => (-1, null) }
        row = new GenericInternalRow(Array[Any](
          UTF8String.fromString(url), page, status,
          if (status == 200 && body != null) UTF8String.fromString(body) else null))
        true
      }
      override def get(): InternalRow = row
      override def close(): Unit = ()
    }
  }
}
