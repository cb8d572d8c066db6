package graft
import org.apache.spark.sql.{DataFrame, SparkSession}
object Bench {
  /** Execute the query's REAL plan: a noop-format write runs the full
    * executed plan — final sorts, wide projections, everything Verify
    * materializes — where a bare `.count()` would let Catalyst drop
    * top-level ORDER BY (EliminateSorts) and prune most columns, making
    * sort/top-k and wide-projection queries look cheaper than they are. */
  private def exec(df: DataFrame): Unit =
    df.write.mode("overwrite").format("noop").save()

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .withExtensions(new graft.functions.GraftExtensions)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm-up: run the whole set once at the smallest SF so the timed pass
    // below measures query execution, not JVM JIT + whole-stage-codegen
    // compilation (the generated code is cached by source, so same-shaped
    // plans at the target SF hit the cache).
    val warmDir = "/root/testdata/sf0.001"
    if (new java.io.File(warmDir).isDirectory && warmDir != sfDir)
      SparkEntry.queries.foreach { case (_, fn) =>
        try exec(fn(spark, warmDir)) catch { case _: Throwable => () }
      }
    val results = SparkEntry.queries.map { case (name, fn) =>
      val t0 = System.nanoTime()
      val ok = try { exec(fn(spark, sfDir)); true } catch {
        case e: Throwable =>
          System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
          false
      }
      (name, (System.nanoTime() - t0) / 1e9, ok)
    }
    val qs = results.map { case (k, v, _) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val failed = results.collect { case (k, _, false) => s"\"$k\"" }
      .mkString("[", ",", "]")
    val total = results.map(_._2).sum
    val line = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":$failed,"sf":"$sfDir"}"""
    println(line)
    // Also land the JSON in a file: the driver greps sbt's log tail for the
    // stdout line, and round 1 showed that parse can fail ("parsed": null).
    val outFile = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_out.json")
    try java.nio.file.Files.writeString(java.nio.file.Paths.get(outFile), line + "\n")
    catch { case e: Throwable => System.err.println(s"[bench] write $outFile: ${e.getMessage}") }
    spark.stop()
  }
}
