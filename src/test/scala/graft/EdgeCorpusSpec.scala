package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** The text-pipeline queries must survive a corpus the fixtures don't
  * contain: empty text, single-token and two-token docs (no shingles),
  * and exact duplicates. Each declared text query runs end-to-end over a
  * synthetic documents.parquet with those shapes.
  */
class EdgeCorpusSpec extends SparkSpec {
  import spark.implicits._

  private lazy val dir: String = {
    val d = Files.createTempDirectory("edge_corpus").toString
    val docs = Seq(
      (1L, "", "en", "web", 0L),
      (2L, "one", "en", "web", 3L),
      (3L, "two words", "en", "web", 9L),
      (4L, "three word document here now", "en", "web", 28L),
      (5L, "three word document here now", "en", "web", 28L), // exact dup
      (6L, "a b c d e f g h i j k l m n o p", "de", "book", 31L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    docs.coalesce(1).write.mode("overwrite").parquet(s"$d/documents.parquet")
    d
  }

  private val textQueries = Seq(
    "q40_dedup_exact", "q41_dedup_minhash_lsh", "q42_dedup_simhash",
    "q43_dedup_ngram_jaccard", "q47_text_stats", "q48_lang_id",
    "q49_quality_score", "q50_fingerprint", "q51_token_count",
    "q52_tfidf_top_terms", "q76_dedup_clusters", "q80_fn_posexplode")

  textQueries.foreach { name =>
    test(s"$name runs on the degenerate corpus") {
      val rows = SparkEntry.queries(name)(spark, dir).collect()
      assert(rows != null) // no crash is the contract; counts vary per query
    }
  }

  test("q76 clusters the exact-dup pair; a collision-free corpus yields zero clusters, no crash") {
    val clusters = SparkEntry.queries("q76_dedup_clusters")(spark, dir).collect()
    assert(clusters.exists(r =>
      r.getLong(0) == 4L && r.getLong(1) == 2L && r.getString(2) == "4,5"))
    // two docs with disjoint shingles: no candidate edges at all — the
    // label-propagation loop must terminate on the empty node set
    val d2 = Files.createTempDirectory("edge_corpus_nodup").toString
    Seq(
      (1L, "three word document here now", "en", "web", 28L),
      (2L, "a b c d e f g h i j k l m n o p", "de", "book", 31L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$d2/documents.parquet")
    assert(SparkEntry.queries("q76_dedup_clusters")(spark, d2).collect().isEmpty)
  }

  test("q41 drops shingle-less docs; q43 finds the exact-dup pair") {
    val lsh = SparkEntry.queries("q41_dedup_minhash_lsh")(spark, dir)
    assert(lsh.agg(sum($"n_buckets")).head.getLong(0) > 0)
    val jac = SparkEntry.queries("q43_dedup_ngram_jaccard")(spark, dir).collect()
    assert(jac.exists(r => r.getLong(0) == 4L && r.getLong(1) == 5L
      && r.getDouble(2) == 1.0))
  }
}
