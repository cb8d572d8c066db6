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
  //
  // BeautifulSoup-faithful without a parser dependency (jsoup is not on the
  // image classpath): tags are located by OPEN-TAG scan and their attributes
  // parsed generically, so attribute ORDER, quote style (double / single /
  // unquoted), and whitespace around `=` never matter — `find(class_=...)`
  // matches a whitespace-separated class TOKEN, `find(attrs={...})` an exact
  // attribute value, and text is `get_text(strip=True)` (every text node
  // stripped, concatenated), exactly BS4's behavior on the same input.
  // Known divergence, documented: an element's extent is taken to the FIRST
  // close tag of its own name, so a geo <div> containing a *nested div*
  // would truncate early (nested spans/b/i are fine) — the reference site's
  // cards don't nest divs inside the geo element.

  private val dateRe = Pattern.compile("""(\d{4}-\d{2}-\d{2})""")

  private def openTagRe(tag: String) =
    Pattern.compile("(?i)<" + tag + "\\b([^>]*?)/?>")
  private val divOpen = openTagRe("div")
  private val spanOpen = openTagRe("span")
  private val pOpen = openTagRe("p")
  private val anyTag = Pattern.compile("<[^>]*>")

  /** One HTML attribute: name = "dq" | 'sq' | bare (all legal per the HTML
    * spec and handled by BS4's html.parser). */
  private val attrValRe = Pattern.compile(
    """(?i)([a-zA-Z][-\w:]*)\s*=\s*(?:"([^"]*)"|'([^']*)'|([^\s>"']+))""")

  /** First value of `name` inside an open tag's attribute string, any
    * position, any quote style. */
  private def attrValue(attrs: String, name: String): Option[String] = {
    val m = attrValRe.matcher(attrs)
    while (m.find()) {
      if (m.group(1).equalsIgnoreCase(name)) {
        val v =
          if (m.group(2) != null) m.group(2)
          else if (m.group(3) != null) m.group(3)
          else m.group(4)
        return Some(v)
      }
    }
    None
  }

  /** BS4 `class_=` semantics: the token appears in the whitespace-split
    * class list (never a substring match — "listing-card__content-extra"
    * must NOT match). */
  private def hasClassToken(attrs: String, token: String): Boolean =
    attrValue(attrs, "class").exists(_.trim.split("\\s+").contains(token))

  /** BS4 `get_text(strip=True)`: strip each text node, concatenate. */
  private def innerText(s: String): String =
    anyTag.split(s).iterator.map(_.trim).filter(_.nonEmpty).mkString("")

  /** Chunk the document at each card-open tag (BS4's `find_all(
    * "div", class_="listing-card__content")` loop scope): a card's search
    * scope runs to the next card start. */
  private def cardChunks(html: String): IndexedSeq[String] = {
    val m = divOpen.matcher(html)
    val starts = scala.collection.mutable.ArrayBuffer.empty[Int]
    while (m.find()) {
      if (hasClassToken(m.group(1), "listing-card__content")) starts += m.start()
    }
    starts.indices.map { i =>
      val end = if (i + 1 < starts.length) starts(i + 1) else html.length
      html.substring(starts(i), end)
    }
  }

  /** First `tag` with the class token; inner text to the first matching
    * close tag (see divergence note above). */
  private def classedText(chunk: String, open: Pattern, tag: String, token: String): Option[String] = {
    val m = open.matcher(chunk)
    while (m.find()) {
      if (hasClassToken(m.group(1), token)) {
        val close = Pattern.compile("(?i)</" + tag + "\\s*>").matcher(chunk)
        if (close.find(m.end())) return Some(innerText(chunk.substring(m.end(), close.start())))
        return Some(innerText(chunk.substring(m.end())))
      }
    }
    None
  }

  /** BS4 `find("p", {"data-test": test}).get("content")`: the FIRST p whose
    * data-test equals `test` exactly decides the answer — a missing content
    * attr on that p is a miss (None), not a cue to keep searching. */
  private def dataTestContent(chunk: String, test: String): Option[String] = {
    val m = pOpen.matcher(chunk)
    while (m.find()) {
      if (attrValue(m.group(1), "data-test").contains(test))
        return attrValue(m.group(1), "content")
    }
    None
  }

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
    cardChunks(html).map { chunk =>
      Listing(
        FechaDescarga = fecha,
        Barrio = classedText(chunk, divOpen, "div", "listing-card__location__geo"),
        Valor = classedText(chunk, spanOpen, "span", "price__actual"),
        NumHabitaciones = toIntOpt(dataTestContent(chunk, "bedrooms")),
        NumBanos = toIntOpt(dataTestContent(chunk, "bathrooms")),
        mts2 = toDoubleOpt(dataTestContent(chunk, "floor-area")))
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
