package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.Multimodal

/** Declared MULTIMODAL queries — the binary-column path under the
  * driver's oracle gate, not just specs. The codecs are the real JDK
  * ones (`operators/Multimodal.scala`); what makes a media query
  * ORACLE-CHECKABLE is synthesizing the payload from table integers in
  * closed form, so DuckDB can re-derive every output number from the
  * same integers while the Spark side genuinely round-trips real
  * encoded bytes.
  *
  * Reference scope: the reference pipeline ships OPAQUE payloads
  * (`/root/reference/download_lambda.py:23-38` moves fetched bodies
  * around as bytes); feature extraction over decoded media is the
  * training-data-pipeline extension (SURVEY §2.C).
  */
object Media {

  private val W = 16
  private val H = 16

  /** Per-pixel closed form: gray(part, i) = (partkey·37 + i·11) mod 256.
    * Chosen so the ORACLE can recompute it with one unnested index join —
    * no codec on the oracle side, a REAL codec on the Spark side. */
  private def gray(pk: Long, i: Int): Int = ((pk * 37 + i * 11) % 256).toInt

  private case class PxStats(sum_lum: Long, n_bright: Long, exact: Boolean)

  /** Multimodal image-feature census — the decode/feature-extract shape
    * of a training-data pipeline as a DECLARED query: synthesize one
    * 16×16 gray PNG per part (REAL `javax.imageio` encode — deflate,
    * chunks, CRCs), carry it as an opaque `binary` column, check the
    * 8-byte PNG signature IN-PLAN (`substring` on binary — the
    * declarative part of payload validation), then decode (real codec
    * again) and reduce pixels to integer stats. `roundtrip_ok` asserts
    * the decoded raster matches the closed form bit-for-bit — PNG is
    * lossless, so any false means the codec path corrupted the payload;
    * the oracle states it as TRUE (the q18/q168 contract pattern).
    * Scale: one dimension-table pass; the codec UDFs are per-row CPU
    * with zero shuffle (embarrassingly parallel — the one place a UDF
    * is the design, not a compromise: codecs aren't expressible in
    * Catalyst), followed by a ≤|brands| census. At 100 TB the same
    * plan holds with the binary column read from the lake instead of
    * synthesized. */
  def imageFeatureCensus(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val enc = udf { (pk: Long) =>
      import java.awt.image.BufferedImage
      val img = new BufferedImage(W, H, BufferedImage.TYPE_INT_RGB)
      var i = 0
      while (i < W * H) {
        val g = gray(pk, i)
        img.setRGB(i % W, i / W, (g << 16) | (g << 8) | g)
        i += 1
      }
      Multimodal.ImageIoCodec.toPng(img)
    }
    val dec = udf { (png: Array[Byte], pk: Long) =>
      Multimodal.ImageIoCodec.tryDecode(png) match {
        case Some(img) if img.getWidth == W && img.getHeight == H =>
          var sum = 0L; var bright = 0L; var exact = true; var i = 0
          while (i < W * H) {
            val g = img.getRGB(i % W, i / W) & 0xff
            sum += g
            if (g >= 192) bright += 1
            exact &&= g == gray(pk, i)
            i += 1
          }
          PxStats(sum, bright, exact)
        case _ => PxStats(0L, 0L, exact = false)
      }
    }
    Tables.part(s, dir)
      .select($"p_brand", $"p_partkey", enc($"p_partkey").as("png"))
      .withColumn("sig_ok",
        hex(substring($"png", 1, 8)) === lit("89504E470D0A1A0A"))
      .withColumn("st", dec($"png", $"p_partkey"))
      .groupBy($"p_brand")
      .agg(count(lit(1)).as("n_images"),
        sum($"st.sum_lum").as("sum_lum"),
        sum($"st.n_bright").as("n_bright"),
        expr("bool_and(sig_ok AND st.exact)").as("roundtrip_ok"))
      .orderBy($"p_brand")
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q283_image_feature_census" -> imageFeatureCensus
  )

  def oracles: Map[String, String] = Map(
    // The oracle never touches a codec: it re-derives the pixel sums
    // from the same closed form the encoder used. roundtrip_ok is the
    // stated-TRUE contract — if the Spark codec path ever corrupts a
    // payload, the hash compare fails on that cell.
    "q283_image_feature_census" ->
      s"""WITH idx AS (SELECT unnest(generate_series(0, ${W * H - 1})) AS i),
         |px AS (
         |  SELECT p_brand, p_partkey,
         |         CAST((p_partkey * 37 + i * 11) % 256 AS BIGINT) AS g
         |  FROM part CROSS JOIN idx
         |)
         |SELECT p_brand,
         |       CAST(count(DISTINCT p_partkey) AS BIGINT) AS n_images,
         |       CAST(sum(g) AS BIGINT) AS sum_lum,
         |       CAST(sum(CASE WHEN g >= 192 THEN 1 ELSE 0 END) AS BIGINT) AS n_bright,
         |       TRUE AS roundtrip_ok
         |FROM px
         |GROUP BY 1
         |ORDER BY 1""".stripMargin
  )
}
