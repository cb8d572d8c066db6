package graft

import java.nio.file.Files

import graft.pipeline.Listings
import graft.pipeline.Listings.Listing

/** Golden tests for the reference-semantics extraction pipeline — covering
  * exactly the stage the reference left untested (its only test file never
  * imports process_handler; /root/reference/tests/test_download.py:13). HTML
  * fixtures match the selectors at download_lambda.py:88,99,102,105,110,113.
  */
class ListingsSpec extends SparkSpec {

  private def card(
      price: Option[String] = Some("$ 185.000.000"),
      geo: Option[String] = Some("Chapinero, Bogotá"),
      bedrooms: Option[String] = Some("1"),
      bathrooms: Option[String] = Some("1"),
      area: Option[String] = Some("42")): String = {
    val sb = new StringBuilder("""<div class="listing-card__content">""")
    price.foreach(p => sb.append(s"""<span class="price__actual">$p</span>"""))
    geo.foreach(g => sb.append(s"""<div class="listing-card__location__geo">$g</div>"""))
    bedrooms.foreach(b => sb.append(s"""<p data-test="bedrooms" content="$b"></p>"""))
    bathrooms.foreach(b => sb.append(s"""<p data-test="bathrooms" content="$b"></p>"""))
    area.foreach(a => sb.append(s"""<p data-test="floor-area" content="$a"></p>"""))
    sb.append("</div>").toString
  }

  test("full card extracts all six fields with filename date round-trip") {
    val rows = Listings.extractListings("2024-03-14.html", card())
    assert(rows === Seq(Listing(
      java.sql.Date.valueOf("2024-03-14"),
      Some("Chapinero, Bogotá"), Some("$ 185.000.000"), Some(1), Some(1), Some(42.0))))
  }

  test("each missing field independently becomes null (not a sentinel)") {
    val r1 = Listings.extractListings("2024-01-01.html", card(price = None)).head
    assert(r1.Valor.isEmpty && r1.Barrio.nonEmpty)
    val r2 = Listings.extractListings("2024-01-01.html", card(geo = None)).head
    assert(r2.Barrio.isEmpty && r2.Valor.nonEmpty)
    val r3 = Listings.extractListings("2024-01-01.html", card(bedrooms = None)).head
    assert(r3.NumHabitaciones.isEmpty && r3.NumBanos.contains(1))
    val r4 = Listings.extractListings("2024-01-01.html", card(area = None)).head
    assert(r4.mts2.isEmpty)
  }

  test("empty document yields no rows (empty-input guard semantics)") {
    assert(Listings.extractListings("2024-01-01.html", "<html><body></body></html>").isEmpty)
  }

  test("multiple cards explode to multiple rows (UDTF semantics)") {
    val html = s"<html>${card()}${card(bedrooms = Some("2"))}${card(area = Some("99"))}</html>"
    val rows = Listings.extractListings("2024-01-01.html", html)
    assert(rows.size === 3)
    assert(rows(1).NumHabitaciones.contains(2))
    assert(rows(2).mts2.contains(99.0))
  }

  // --- adversarial goldens: BS4-parity on real-world-messy markup ---
  // BeautifulSoup (download_lambda.py:87-114) is indifferent to attribute
  // order, quote style, and whitespace; a regex port that bakes in one
  // canonical serialization silently extracts null on reordered attrs.

  test("attribute order is irrelevant: content before data-test still extracts") {
    val html =
      """<div class="listing-card__content">
        |<p content="3" data-test="bedrooms"></p>
        |<p class="x" content="2" id="b" data-test="bathrooms"></p>
        |<p data-test="floor-area" class="y" content="77.5"></p>
        |</div>""".stripMargin
    val r = Listings.extractListings("2024-01-01.html", html).head
    assert(r.NumHabitaciones.contains(3))
    assert(r.NumBanos.contains(2))
    assert(r.mts2.contains(77.5))
  }

  test("single-quoted / unquoted attributes and whitespace around = parse like BS4") {
    val html =
      """<div class = 'listing-card__content extra'>
        |<span class='price__actual ask'>$ 99.000.000</span>
        |<div class = "geo listing-card__location__geo">Suba</div>
        |<p data-test = 'bedrooms' content = 2></p>
        |<p content=1 data-test=bathrooms></p>
        |</div>""".stripMargin
    val r = Listings.extractListings("2024-01-01.html", html).head
    assert(r.Valor.contains("$ 99.000.000"))
    assert(r.Barrio.contains("Suba"))
    assert(r.NumHabitaciones.contains(2))
    assert(r.NumBanos.contains(1))
  }

  test("class matches the whitespace token, never a substring (BS4 class_ semantics)") {
    // listing-card__content-extra must NOT open a card; price__actual-old
    // must NOT be the price element.
    val html =
      """<div class="listing-card__content-extra"><span class="price__actual">$ 1</span></div>
        |<div class="listing-card__content">
        |<span class="price__actual-old">$ 2</span>
        |<span class="price__actual">$ 3</span>
        |</div>""".stripMargin
    val rows = Listings.extractListings("2024-01-01.html", html)
    assert(rows.size === 1)
    assert(rows.head.Valor.contains("$ 3"))
  }

  test("nested inline tags inside price/geo concatenate like get_text(strip=True)") {
    val html =
      """<div class="listing-card__content">
        |<span class="price__actual">$ <b>185</b>.000.000 </span>
        |<div class="listing-card__location__geo"> <span>Chapinero</span>, <i>Bogotá</i> </div>
        |</div>""".stripMargin
    val r = Listings.extractListings("2024-01-01.html", html).head
    // get_text(strip=True) strips each text node then concatenates
    assert(r.Valor.contains("$185.000.000"))
    assert(r.Barrio.contains("Chapinero,Bogotá"))
  }

  test("first matching p decides: missing content on it is a miss, not a fallthrough") {
    // BS4's find returns the FIRST data-test match; .get("content") on it
    // is None even if a LATER p carries a content attr.
    val html =
      """<div class="listing-card__content">
        |<p data-test="bedrooms"></p>
        |<p data-test="bedrooms" content="9"></p>
        |</div>""".stripMargin
    val r = Listings.extractListings("2024-01-01.html", html).head
    assert(r.NumHabitaciones.isEmpty)
  }

  test("self-closing p tags and uppercase tag names extract the same") {
    val html =
      """<DIV CLASS="listing-card__content">
        |<P data-test="bedrooms" content="4"/>
        |<SPAN class="price__actual">$ 5</SPAN>
        |</DIV>""".stripMargin
    val r = Listings.extractListings("2024-01-01.html", html).head
    assert(r.NumHabitaciones.contains(4))
    assert(r.Valor.contains("$ 5"))
  }

  test("distributed extract over a Dataset of pages") {
    import spark.implicits._
    val pages = spark.createDataset(Seq(
      ("2024-01-01.html", card()),
      ("2024-01-02.html", s"${card()}${card()}")))
    val out = Listings.extract(pages)
    assert(out.count() === 3)
    assert(out.filter(_.FechaDescarga.toString == "2024-01-02").count() === 2)
  }

  test("CSV sink writes header and N/A sentinels at the boundary only") {
    import spark.implicits._
    val pages = spark.createDataset(Seq(("2024-01-01.html", card(price = None))))
    val df = Listings.extract(pages).toDF()
    assert(df.filter(df("Valor").isNull).count() === 1) // null internally
    val dir = Files.createTempDirectory("csvout").toString
    Listings.writeCsv(df, dir)
    val back = spark.read.option("header", "true").csv(dir)
    assert(back.columns.toSeq === Listings.csvHeader)
    assert(back.select("Valor").head.getString(0) === "N/A")
  }

  test("partitioned parquet sink prunes by dt") {
    import spark.implicits._
    val pages = spark.createDataset(Seq(
      ("2024-01-01.html", card()), ("2024-01-02.html", card())))
    val dir = Files.createTempDirectory("pqout").toString
    Listings.writePartitionedParquet(Listings.extract(pages).toDF(), dir)
    assert(new java.io.File(dir).list().exists(_.startsWith("dt=")))
    val pruned = spark.read.parquet(dir).filter(org.apache.spark.sql.functions.col("dt") === "2024-01-01")
    assert(pruned.count() === 1)
    // The dt predicate must prune at PLANNING time (PartitionFilters on the
    // scan), not scan-then-filter — at 100 TB this is the difference
    // between reading one day and reading the table.
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(dt"),
      s"dt filter did not reach the scan's partition filters:\n$plan")
    assert(!plan.contains("PushedFilters: [IsNotNull(dt"),
      "dt must prune as a partition column, not a data filter")
  }

  test("Generator UDTF (graft_extract_listings) matches the flatMap extract") {
    import spark.implicits._
    val pages = Seq(
      ("2024-01-01.html", s"${card()}${card(bedrooms = Some("2"))}"),
      ("2024-01-02.html", card(price = None)),
      ("2024-01-03.html", "<html>no cards</html>")).toDF("file", "value")
    // A multi-column generator in a select list emits its element schema:
    val viaGen = pages.selectExpr("graft_extract_listings(file, value)")
    val viaFlatMap = Listings.extract(pages.as[(String, String)]).toDF()
    assert(viaGen.columns.toSeq === viaFlatMap.columns.toSeq)
    assert(viaGen.collect().toSet === viaFlatMap.collect().toSet)
    assert(viaGen.count() === 3) // 2 + 1 + 0 rows
  }

  test("price parsing: built-in expression and scalar udf() agree") {
    import org.apache.spark.sql.functions.{col, udf}
    import spark.implicits._
    val prices = Seq("$ 185.000.000", "$1.200.000", "N/A", "", null, "99")
      .toDF("valor")
    val parseUdf = udf(Listings.parseValorPesosScala _)
    val out = prices.select(
      Listings.parseValorPesos(col("valor")).as("builtin"),
      parseUdf(col("valor")).as("viaUdf")).collect()
    val expected = Seq(Some(185000000L), Some(1200000L), None, None, None, Some(99L))
    out.zip(expected).foreach { case (r, e) =>
      val b = if (r.isNullAt(0)) None else Some(r.getLong(0))
      val u = if (r.isNullAt(1)) None else Some(r.getLong(1))
      assert(b === e && u === e)
    }
  }

  test("error-tolerant fetch keeps partial results (reference R2 contract)") {
    val body = card() // materialize outside the closure (serializable capture)
    val fetch: String => (Int, String) =
      url => if (url.contains("page=5")) (404, "") else (200, body)
    val urls = (1 to 10).map(i => s"http://example.test/list?page=$i")
    val pages = Listings.fetchPages(spark, urls, fetch)
    val good = Listings.goodPages(pages)
    assert(pages.count() === 10)
    assert(good.count() === 9) // page 5 skipped, run still succeeds
  }
}
