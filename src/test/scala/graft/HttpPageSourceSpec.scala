package graft

import graft.pipeline.Listings
import graft.sources.{HttpPageSource, PageFetcher}

/** Fixture fetcher — top-level class (no-arg ctor, reflectively built on
  * executors). Page 5 404s, reproducing the reference's error-tolerance
  * contract (`tests/test_download.py:103-116`). */
class FixtureFetcher extends PageFetcher {
  override def fetch(url: String): (Int, String) = {
    val page = url.split("page=").last.toInt
    if (page == 5) (404, null)
    else (200,
      s"""<div class="listing-card__content">
         |<span class="price__actual">$$ ${page}00.000.000</span>
         |<div class="listing-card__location__geo">Zona $page</div>
         |<p data-test="bedrooms" content="$page"></p>
         |</div>""".stripMargin)
  }
}

/** A fetcher that throws — the reader must convert it to a status -1 row,
  * never fail the task. */
class ThrowingFetcher extends PageFetcher {
  override def fetch(url: String): (Int, String) =
    if (url.endsWith("page=3")) throw new RuntimeException("boom")
    else (200, "<div class=\"listing-card__content\"></div>")
}

class HttpPageSourceSpec extends SparkSpec {

  private def read(pages: Int, perPart: Int, fetcher: Class[_]) =
    spark.read.format(classOf[HttpPageSource].getName)
      .option("urlTemplate", "http://fixture.local/search?page={page}")
      .option("pages", pages.toString)
      .option("pagesPerPartition", perPart.toString)
      .option("fetcher", fetcher.getName)
      .load()

  test("one InputPartition per page range: fetch parallelism = ceil(pages/perPart)") {
    val df = read(pages = 10, perPart = 2, classOf[FixtureFetcher])
    assert(df.rdd.getNumPartitions === 5)
    assert(read(10, 3, classOf[FixtureFetcher]).rdd.getNumPartitions === 4)
    assert(df.count() === 10)
  }

  test("PERMISSIVE error rows: a 404 page is a row, not a failure (reference R2)") {
    val rows = read(10, 2, classOf[FixtureFetcher]).collect()
    assert(rows.length === 10) // run succeeded despite the dead page
    val bad = rows.filter(_.getInt(2) != 200)
    assert(bad.map(_.getInt(1)).toSeq === Seq(5))
    assert(bad.head.isNullAt(3)) // no body on the error row
    val good = rows.filter(_.getInt(2) == 200)
    assert(good.length === 9 && good.forall(!_.isNullAt(3)))
  }

  test("a throwing fetcher degrades to a status -1 row, never a task failure") {
    val rows = read(4, 2, classOf[ThrowingFetcher]).collect()
    assert(rows.length === 4)
    assert(rows.filter(_.getInt(2) == -1).map(_.getInt(1)).toSeq === Seq(3))
  }

  test("source composes with the extraction pipeline end to end") {
    import spark.implicits._
    val pages = read(10, 2, classOf[FixtureFetcher])
      .filter($"status" === 200)
      .select(concat(lit("2024-03-14-"), $"page").as("file"), $"body")
      .as[(String, String)]
    val listings = Listings.extract(pages).collect()
    assert(listings.length === 9)
    assert(listings.forall(_.FechaDescarga === java.sql.Date.valueOf("2024-03-14")))
    assert(listings.map(_.NumHabitaciones.get).sorted === Seq(1, 2, 3, 4, 6, 7, 8, 9, 10))
  }

  private def concat(cols: org.apache.spark.sql.Column*) =
    org.apache.spark.sql.functions.concat(cols: _*)
  private def lit(v: Any) = org.apache.spark.sql.functions.lit(v)
}
