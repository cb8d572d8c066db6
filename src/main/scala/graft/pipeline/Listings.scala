package graft.pipeline

import java.sql.Date
import java.util.regex.Pattern

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** The reference's core pipeline, Spark-native: paginated fetch → raw store
  * → per-document listing extraction → typed table → CSV/parquet sinks.
  *
  * Reference semantics reproduced (citations into /root/reference):
  *   - listing-card selectors: `download_lambda.py:88,99,102,105,110,113`
  *   - missing field → null internally, `"N/A"` only at the CSV boundary
  *     (`download_lambda.py:100,103,107-108,111,114`)
  *   - filename date → `FechaDescarga` column (`download_lambda.py:46-47,95`)
  *   - CSV header order (`download_lambda.py:124-127`)
  *   - error-tolerant fetch: non-200 page skipped, run continues
  *     (`download_lambda.py:39-43`; contract in `tests/test_download.py:103-116`)
  *   - empty-input guard (`download_lambda.py:89-92`)
  *
  * Architecture: the reference's serial loop + whole-corpus string concat
  * becomes one row per (filename, page); extraction is a `flatMap` — i.e. a
  * document→rows UDTF — that runs map-side on executors. Parsing is
  * regex-based against the reference's *fixed* class/attr selectors (jsoup
  * is not on the image's classpath; the selectors are literal string
  * matches, so regexes are exact here).
  */
object Listings {

  /** Typed listing row (FIXTURES.md §A2). Nullable fields are Options. */
  case class Listing(
      FechaDescarga: Date,
      Barrio: Option[String],
      Valor: Option[String],
      NumHabitaciones: Option[Int],
      NumBanos: Option[Int],
      mts2: Option[Double])

  /** A fetched page: url, HTTP status, body (null body on failure). */
  case class FetchedPage(url: String, status: Int, body: String)

  val csvHeader: Seq[String] =
    Seq("FechaDescarga", "Barrio", "Valor", "NumHabitaciones", "NumBanos", "mts2")

  // --- extraction (reference process_handler, download_lambda.py:87-119) ---

  private val cardSplit =
    Pattern.compile("""<div[^>]*class="[^"]*listing-card__content[^"]*"[^>]*>""")
  private val priceRe =
    Pattern.compile("""<span[^>]*class="[^"]*price__actual[^"]*"[^>]*>(.*?)</span>""", Pattern.DOTALL)
  private val geoRe =
    Pattern.compile("""<div[^>]*class="[^"]*listing-card__location__geo[^"]*"[^>]*>(.*?)</div>""", Pattern.DOTALL)
  private def attrRe(test: String) =
    Pattern.compile("""<p[^>]*data-test="""" + test + """"[^>]*content="([^"]*)"""")
  private val bedroomsRe = attrRe("bedrooms")
  private val bathroomsRe = attrRe("bathrooms")
  private val areaRe = attrRe("floor-area")
  private val dateRe = Pattern.compile("""(\d{4}-\d{2}-\d{2})""")

  private def first(p: Pattern, s: String): Option[String] = {
    val m = p.matcher(s)
    if (m.find()) Some(m.group(1).trim) else None
  }

  private def toIntOpt(s: Option[String]): Option[Int] =
    s.flatMap(v => scala.util.Try(v.trim.toInt).toOption)
  private def toDoubleOpt(s: Option[String]): Option[Double] =
    s.flatMap(v => scala.util.Try(v.trim.toDouble).toOption)

  /** Document → rows explosion (the reference's `find_all` at
    * `download_lambda.py:88`): one HTML document yields N listings. Pure
    * function — usable from flatMap, tests, or a Generator. */
  def extractListings(fileName: String, html: String): Seq[Listing] = {
    val fecha = first(dateRe, fileName)
      .map(Date.valueOf)
      .getOrElse(new Date(0L))
    val chunks = cardSplit.split(html).drop(1) // text before the first card is not a card
    chunks.toIndexedSeq.map { chunk =>
      Listing(
        FechaDescarga = fecha,
        Barrio = first(geoRe, chunk),
        Valor = first(priceRe, chunk),
        NumHabitaciones = toIntOpt(first(bedroomsRe, chunk)),
        NumBanos = toIntOpt(first(bathroomsRe, chunk)),
        mts2 = toDoubleOpt(first(areaRe, chunk)))
    }
  }

  /** Pipeline stage: (fileName, html) rows → typed listing table.
    * Distributed flatMap; the parse runs where the data is. */
  def extract(pages: Dataset[(String, String)]): Dataset[Listing] = {
    import pages.sparkSession.implicits._
    pages.flatMap { case (name, html) => extractListings(name, html) }
  }

  /** Whole-file ingest (reference R8: one S3 object → one document).
    * `wholetext` keeps one row per file; `input_file_name` carries the
    * provenance the reference recovers from the event record. */
  def readHtmlDir(spark: SparkSession, dir: String): Dataset[(String, String)] = {
    import spark.implicits._
    spark.read.option("wholetext", "true").text(dir)
      .select(input_file_name().as("file"), col("value"))
      .as[(String, String)]
  }

  /** Error-tolerant paginated fetch (R1/R2): the fetch function is injected
    * so tests never touch the network; non-200 pages are kept as rows and
    * filtered, mirroring the reference's skip-and-continue. At scale this is
    * a `mapPartitions` over a partitioned url list — fetch parallelism =
    * partition count, and one bad page never fails the job. */
  def fetchPages(
      spark: SparkSession,
      urls: Seq[String],
      fetch: String => (Int, String)): Dataset[FetchedPage] = {
    import spark.implicits._
    val errors = spark.sparkContext.longAccumulator("fetch_errors")
    spark.createDataset(urls)
      .repartition(math.max(1, math.min(urls.size, 8)))
      .mapPartitions { it =>
        it.map { url =>
          val (status, body) = try fetch(url) catch { case _: Exception => (-1, null) }
          if (status != 200) errors.add(1)
          FetchedPage(url, status, if (status == 200) body else null)
        }
      }
  }

  /** Successful pages only — the reference accumulates exactly these
    * (`download_lambda.py:39-43`). */
  def goodPages(pages: Dataset[FetchedPage]): Dataset[FetchedPage] =
    pages.filter(_.status == 200)

  /** Parse the reference's COP price strings ("$ 185.000.000" →
    * 185000000L). Built-in expressions (regexp_replace + cast), not a UDF —
    * stays inside whole-stage codegen; unparseable/absent prices → null.
    * The ScalaTest spec also registers the same logic as a scalar `udf()`
    * and asserts equality, covering the UDF surface (SURVEY §2.B) while
    * documenting why the built-in form is the production path. */
  def parseValorPesos(valor: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    nullif(regexp_replace(valor, "[^0-9]", ""), lit("")).cast("long")

  /** Plain-Scala twin of [[parseValorPesos]] for the udf() registration. */
  def parseValorPesosScala(valor: String): Option[Long] = {
    if (valor == null) None
    else {
      val digits = valor.filter(_.isDigit)
      if (digits.isEmpty) None else Some(digits.toLong)
    }
  }

  // --- sinks ---

  /** CSV sink with reference byte-compat: header row, nulls → "N/A"
    * (`download_lambda.py:100-127`). Internally columns stay typed/null;
    * the sentinel exists only at this boundary. */
  def writeCsv(listings: DataFrame, path: String): Unit = {
    val out = listings.select(
      col("FechaDescarga").cast("string"),
      coalesce(col("Barrio"), lit("N/A")).as("Barrio"),
      coalesce(col("Valor"), lit("N/A")).as("Valor"),
      coalesce(col("NumHabitaciones").cast("string"), lit("N/A")).as("NumHabitaciones"),
      coalesce(col("NumBanos").cast("string"), lit("N/A")).as("NumBanos"),
      coalesce(col("mts2").cast("string"), lit("N/A")).as("mts2"))
    out.write.mode("overwrite").option("header", "true").csv(path)
  }

  /** Partitioned parquet sink: the reference's date-named objects
    * (`download_lambda.py:46-47`) generalized to `dt=` partitions — at
    * 100 TB this is what makes date-range queries prune to a file subset. */
  def writePartitionedParquet(listings: DataFrame, path: String): Unit =
    listings
      .withColumn("dt", col("FechaDescarga"))
      .write.mode("overwrite")
      .partitionBy("dt")
      .parquet(path)
}
