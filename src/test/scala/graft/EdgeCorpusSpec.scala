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
      (6L, "a b c d e f g h i j k l m n o p", "de", "book", 31L),
      (7L, Seq.fill(20)("spam").mkString(" "), "en", "web", 99L), // max repetition
      (8L, (1 to 40).map(i => s"t$i").mkString(" "), "en", "web", 160L)) // spans 2 chunks
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    docs.coalesce(1).write.mode("overwrite").parquet(s"$d/documents.parquet")
    d
  }

  private val textQueries = Seq(
    "q40_dedup_exact", "q41_dedup_minhash_lsh", "q42_dedup_simhash",
    "q43_dedup_ngram_jaccard", "q47_text_stats", "q48_lang_id",
    "q49_quality_score", "q50_fingerprint", "q51_token_count",
    "q52_tfidf_top_terms", "q76_dedup_clusters", "q80_fn_posexplode",
    "q81_quality_repetition", "q82_split_assign", "q83_chunk_overlap",
    "q84_sample_stratified", "q96_decontaminate", "q98_pack_sequences",
    "q104_dedup_editdistance", "q106_sample_weighted", "q107_profile_corpus",
    "q108_dedup_substring", "q114_table_checksum", "q115_url_normalize",
    "q117_dedup_keep_best", "q119_token_histogram", "q127_mix_rebalance",
    "q128_dedup_lines", "q131_quality_unigram_lm", "q132_bm25_search",
    "q133_collocation_pmi", "q147_quality_gopher", "q148_domain_blocklist",
    "q156_curation_funnel", "q157_bpe_merges", "q329_bpe_merge_loop",
    "q360_unigram_lm_tokenizer",
    "q332_ks_drift_stat", "q334_neyman_allocation",
    "q356_cvm_drift_stat", "q364_cohens_kappa", "q365_mann_whitney_u",
    "q180_feature_hashing",
    "q181_dense_id_assignment",
    "q293_importance_resampling",
    "q295_temperature_mixture",
    "q297_bigram_lm_perplexity",
    "q298_boilerplate_census",
    "q299_source_overlap_matrix",
    "q149_inverted_index")

  textQueries.foreach { name =>
    test(s"$name runs on the degenerate corpus") {
      val rows = SparkEntry.queries(name)(spark, dir).collect()
      assert(rows != null) // no crash is the contract; counts vary per query
    }
  }

  test("q128 removes the cross-doc duplicated lines and rebuilds the rest in order") {
    val rows = SparkEntry.queries("q128_dedup_lines")(spark, dir)
      .collect().map(r => r.getLong(0) -> r).toMap
    // docs 4 and 5 are byte-identical: every line of each is shared with
    // the other, so both documents clean down to empty
    assert(rows(4L).getAs[Long]("n_dup_lines") == rows(4L).getAs[Long]("n_lines"))
    assert(rows(4L).getAs[Long]("clean_len") == 0L)
    assert(rows(5L).getAs[Long]("clean_len") == 0L)
    // doc 8's 40 distinct tokens share no 8-token line with anything:
    // reconstruction must reproduce the original text byte-for-byte
    assert(rows(8L).getAs[Long]("n_dup_lines") == 0L)
    assert(rows(8L).getAs[Long]("clean_len") == (1 to 40).map(i => s"t$i").mkString(" ").length.toLong)
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

  test("q81 flags the all-repetition doc and zeroes metrics on sub-bigram docs") {
    val rep = SparkEntry.queries("q81_quality_repetition")(spark, dir)
      .collect().map(r => r.getLong(0) -> r).toMap
    // doc 7 is "spam" ×20: every bigram identical → top_bigram_frac = 1.0
    assert(rep(7L).getAs[Double]("top_bigram_frac") == 1.0)
    assert(!rep(7L).getAs[Boolean]("rep_ok"))
    // doc 2 has one token: no bigrams/trigrams — fractions define to 0, keeps
    assert(rep(2L).getAs[Double]("top_bigram_frac") == 0.0)
    assert(rep(2L).getAs[Double]("dup_trigram_frac") == 0.0)
    assert(rep(2L).getAs[Boolean]("rep_ok"))
    // doc 8 is 40 distinct tokens: zero repetition
    assert(rep(8L).getAs[Long]("top_bigram_cnt") == 1L)
    assert(rep(8L).getAs[Double]("dup_trigram_frac") == 0.0)
  }

  test("q83 chunk math: 40 tokens → chunks of 32 and 16 with an 8-token overlap") {
    val ch = SparkEntry.queries("q83_chunk_overlap")(spark, dir)
      .collect().filter(_.getLong(0) == 8L)
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(ch.toSeq === Seq((0L, 0L, 32L), (1L, 24L, 16L)))
    // every doc appears: even the empty-text doc yields its one chunk
    val docs = SparkEntry.queries("q83_chunk_overlap")(spark, dir)
      .select("doc_id").distinct().count()
    assert(docs == 8L)
  }

  test("q82 buckets partition the corpus; q84 caps the sample per stratum") {
    val split = SparkEntry.queries("q82_split_assign")(spark, dir).collect()
    assert(split.map(_.getAs[Long]("n_docs")).sum == 8L)
    assert(math.abs(split.map(_.getAs[Double]("frac")).sum - 1.0) < 1e-12)
    val sample = SparkEntry.queries("q84_sample_stratified")(spark, dir).collect()
    // 7 en docs + 1 de doc, cap 10 → everything sampled exactly once here
    assert(sample.length == 8)
    assert(sample.map(_.getAs[Int]("rn")).max <= 10)
  }

  test("q104 pairs the exact dup through its block; short texts never crash the slice") {
    // docs 4/5 share the full prefix → distance 0; substring past the end
    // of short/empty texts ('', 'one') must yield empty slices, not errors
    val pairs = SparkEntry.queries("q104_dedup_editdistance")(spark, dir).collect()
    assert(pairs.exists(r => r.getLong(0) == 4L && r.getLong(1) == 5L && r.getInt(2) == 0))
  }

  test("q98 packs every doc exactly once and preserves per-lang token totals") {
    val packed = SparkEntry.queries("q98_pack_sequences")(spark, dir).collect()
    assert(packed.map(_.getAs[Long]("n_docs")).sum == 8L)
    // empty-text doc: split('', ' ') yields [''] in both engines → 1 token
    val enTok = packed.filter(_.getString(0) == "en").map(_.getAs[Long]("sum_tok")).sum
    val deTok = packed.filter(_.getString(0) == "de").map(_.getAs[Long]("sum_tok")).sum
    assert(deTok == 16L) // doc 6: 16 single-letter tokens
    assert(enTok > 0L)
  }

  test("q108 marks the exact-dup pair fully shared; unique and shingle-less docs stay at 0") {
    val rows = SparkEntry.queries("q108_dedup_substring")(spark, dir).collect()
      .map(r => r.getLong(0) -> r).toMap
    // docs 4/5 are byte-identical → every shingle shared, flagged
    Seq(4L, 5L).foreach { id =>
      assert(rows(id).getAs[Double]("shared_frac") == 1.0 &&
        rows(id).getAs[Boolean]("flagged"))
    }
    // the empty and 1-2-token docs have no 3-shingles: 0 total, 0 shared
    Seq(1L, 2L, 3L).foreach { id =>
      assert(rows(id).getAs[Long]("n_shingles") == 0L &&
        rows(id).getAs[Long]("n_shared") == 0L &&
        !rows(id).getAs[Boolean]("flagged"))
    }
    // the unique long docs share nothing
    Seq(6L, 7L, 8L).foreach { id =>
      assert(rows(id).getAs[Long]("n_shared") == 0L)
    }
  }

  test("q41 drops shingle-less docs; q43 finds the exact-dup pair") {
    val lsh = SparkEntry.queries("q41_dedup_minhash_lsh")(spark, dir)
    assert(lsh.agg(sum($"n_buckets")).head.getLong(0) > 0)
    val jac = SparkEntry.queries("q43_dedup_ngram_jaccard")(spark, dir).collect()
    assert(jac.exists(r => r.getLong(0) == 4L && r.getLong(1) == 5L
      && r.getDouble(2) == 1.0))
  }
}
