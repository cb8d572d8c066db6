package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exactness-envelope audit (round-14, r13 verdict item 8): the suite's
  * integer-exact queries rest on DOCUMENTED envelope arguments ("|δ| ≤
  * 4·D·Σqtyc < 2⁶³ for yearly cents-quantity < 2⁵⁰", "ranks stay within
  * long under bounded fan-in", "checksums live in [0, 2⁶¹)"). q308 showed
  * what happens when an envelope claim silently fails (BIGINT retype only
  * after the driver flagged it); this spec turns the prose into executed
  * assertions, two ways:
  *
  *   1. HYPOTHESIS checks — the envelope's premise measured on the
  *      fixture (e.g. q317's yearly per-supplier cents-quantity < 2⁵⁰),
  *      so a fixture or scale change that voids the argument fails CI
  *      before the arithmetic can wrap;
  *   2. WRAP-SYMPTOM checks — for queries whose outputs are non-negative
  *      by construction, any negative long in the output is the classic
  *      two's-complement overflow signature; [[assertNoWrap]] scans every
  *      long column at once.
  *
  * The planted-overflow test proves the detector actually fires: a sum
  * that wraps past 2⁶³ must fail the scan. */
class EnvelopeAuditSpec extends SparkSpec {

  import spark.implicits._

  /** Fails if any LongType column in `df` holds a negative value — the
    * wrap symptom for outputs that are non-negative by construction. */
  private def assertNoWrap(df: DataFrame, what: String): Unit = {
    val longCols = df.schema.fields
      .filter(_.dataType == org.apache.spark.sql.types.LongType).map(_.name)
    assert(longCols.nonEmpty, s"$what: audit expected at least one long column")
    val minCols = longCols.map(c => min(col(c)))
    val combined = if (minCols.size == 1) minCols.head else least(minCols: _*)
    val mins = df.agg(combined.as("m")).collect()(0)
    if (!mins.isNullAt(0))
      assert(mins.getLong(0) >= 0L,
        s"$what: negative value in a non-negative-by-construction long column " +
          s"(cols ${longCols.mkString(",")}) — overflow signature")
  }

  private def run(name: String): DataFrame =
    SparkEntry.queries(name)(spark, sfDir)

  test("planted overflow trips a detector at one of the two layers") {
    // Layer 1 — the engine guard: Spark 4 ANSI arithmetic refuses to wrap,
    // so an in-plan overflow is LOUD (this is what retired the silent-wrap
    // class q203/q222 defended against by hand). Prove the guard is live
    // in this session's configuration:
    val loud = intercept[Exception] {
      Seq(Long.MaxValue, 1L).toDF("v").agg(sum($"v")).collect()
    }
    assert(loud.getMessage.toLowerCase.contains("overflow"),
      s"expected an arithmetic-overflow error, got: ${loud.getMessage.take(120)}")
    // Layer 2 — values that wrapped OUTSIDE checked arithmetic (ingested
    // from a corrupt source, Scala-side constant folding, bitwise/conv
    // channels) arrive as negatives; the scan must flag them:
    val smuggled = Long.MaxValue + 1L // Scala wraps silently: MinValue
    intercept[org.scalatest.exceptions.TestFailedException] {
      assertNoWrap(Seq(smuggled).toDF("v"), "planted")
    }
  }

  test("q317 CUSUM envelope hypothesis holds on the fixture") {
    // Documented: |δ| ≤ 4·D·Σqtyc < 2⁶³ needs D ≤ 366 and yearly
    // per-supplier cents-quantity < 2⁵⁰. Measure both premises.
    val t = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .filter($"l_shipdate" >= lit("1995-01-01") && $"l_shipdate" < lit("1996-01-01"))
      .groupBy($"l_suppkey")
      .agg(sum(queries.Portable.cents($"l_quantity")).as("tq"),
        countDistinct($"l_shipdate").as("nd"))
      .agg(max($"tq").as("max_tq"), max($"nd").as("max_nd")).collect()(0)
    assert(t.getLong(0) < (1L << 50), "yearly supplier cents-quantity < 2^50")
    assert(t.getLong(1) <= 366L, "window days <= 366")
    assertNoWrap(run("q317_cusum_shift_alerts")
      .select("n_days", "n_alarm_days"), "q317 outputs")
  }

  test("q197 fixed-point ranks stay positive and inside the degree-bounded envelope") {
    val pr = run("q197_pagerank_fixed_point")
    val r = pr.agg(min($"pr").as("lo"), max($"pr").as("hi")).collect()(0)
    // a wrapped rank goes negative; a blown in-sum div would exceed any
    // plausible multiple of the 10¹² fixed-point scale
    assert(r.getLong(0) > 0L, "ranks positive (no wrap)")
    assert(r.getLong(1) < 1000L * 1000000000000L,
      "rank within 1000x the fixed-point scale (degree-bounded claim)")
  }

  test("checksum family lives in its documented ranges") {
    // xor of 40-bit digests stays under 2⁴⁰; sum_check is mod 2⁶¹ by
    // construction — on BOTH checksum-bearing queries (q114 and q324).
    for (name <- Seq("q114_table_checksum", "q324_shard_manifest")) {
      val df = run(name)
      val r = df.agg(
        max($"xor_check").as("x"), min($"xor_check").as("x0"),
        max($"sum_check").as("s"), min($"sum_check").as("s0")).collect()(0)
      assert(r.getLong(1) >= 0L && r.getLong(0) < (1L << 40), s"$name xor_check in [0, 2^40)")
      assert(r.getLong(3) >= 0L && r.getLong(2) < (1L << 61), s"$name sum_check in [0, 2^61)")
    }
  }

  test("q290 bottleneck values stay strictly inside the BnInf sentinel") {
    // BnInf = Long.MaxValue/4: a real path's bottleneck is bounded by the
    // max edge weight; the sentinel leaking into census output would mean
    // a seed row survived the node != seed filter or least() saw no edge
    val r = run("q290_widest_path_census")
      .agg(max($"max_bottleneck").as("hi"), min($"min_bottleneck").as("lo"))
      .collect()(0)
    assert(r.getLong(0) < Long.MaxValue / 4, "below the INF sentinel")
    assert(r.getLong(1) >= 1L, "weights are positive trade counts")
  }

  /** The adjacency-list degree bound (Graph.tradeAdjacency's documented
    * precondition): collect_set materializes each node's neighbor set as
    * ONE array row, safe only while max degree stays far below
    * array-row comfort (~10⁵). */
  private val MaxAdjacencyDegree = 100000L

  private def assertDegreeBound(edges: DataFrame, what: String): Unit = {
    val maxDeg = edges.groupBy("src")
      .agg(countDistinct("dst").as("deg"))
      .agg(max($"deg")).collect()(0).getLong(0)
    assert(maxDeg < MaxAdjacencyDegree,
      s"$what: max degree $maxDeg breaches the adjacency-list array-row " +
        s"bound ($MaxAdjacencyDegree) — use the pair-list build (q290's " +
        s"form) for this graph shape")
  }

  test("adjacency-list hub-degree precondition holds on the trade graph") {
    // The hypothesis behind tradeAdjacency's collect_set build: trade
    // degrees are SF-constant (≈40 per customer, ≈600 per supplier).
    // Measure the symmetrized fixture graph; a fixture/shape change that
    // grows a hub fails HERE, not as a dead executor in a bench.
    val orders = spark.read.parquet(s"$sfDir/orders.parquet")
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    val raw = orders.join(li, $"o_orderkey" === $"l_orderkey")
      .select(($"o_custkey" * 2).as("src"), ($"l_suppkey" * 2 + 1).as("dst"))
    val sym = raw.unionAll(raw.select($"dst".as("src"), $"src".as("dst")))
    assertDegreeBound(sym, "trade graph")
    // ... and the detector actually fires: a planted 10⁵-degree hub
    // (one src fanning out to 100k distinct dsts) must trip the bound.
    val hub = spark.range(MaxAdjacencyDegree)
      .select(lit(0L).as("src"), $"id".as("dst"))
    intercept[org.scalatest.exceptions.TestFailedException] {
      assertDegreeBound(hub, "planted hub")
    }
  }

  test("q291 sketch error has headroom under the 15% contract band") {
    // ReachLgK = 9 puts the band at ≈3.3σ; the oracle hard-asserts
    // sketch_within_15pct = TRUE, so a margin collapse (fixture regen, a
    // new gated SF, a precision change) would surface as a confusing
    // value-hash diff. Pin the MEASURED max relative error well inside
    // the band (< 10%) so the collapse is attributed here first.
    val panel = queries.Graph.reachSketchPanel(spark, sfDir)
      .filter($"exact_p1" > 1.0) // zero-reach seeds carry no estimate
      .select((abs($"est" - $"exact_p1") / $"exact_p1").as("rel_err"))
      .agg(max($"rel_err")).collect()(0)
    assert(!panel.isNullAt(0), "panel produced no estimable seeds")
    val maxErr = panel.getDouble(0)
    assert(maxErr < 0.10,
      f"measured max relative error $maxErr%.4f has lost its headroom " +
        f"under the 15%% oracle band — revisit ReachLgK before the " +
        f"CORRECTNESS gate trips")
  }

  test("jlProjected uniform-dimension precondition holds on the embeddings fixture") {
    // jlProjected sizes its sign matrix from ONE arbitrary row and
    // zip_with null-pads any longer vector: heterogeneous embedding
    // lengths would yield NULL projections Spark-side while the oracle
    // projects each row at its own length. The operator's documented
    // precondition is a uniform dimension — measure it, and prove the
    // detector fires on a planted ragged corpus.
    def dimSpread(df: DataFrame) = df
      .agg(min(size($"embedding")).as("lo"), max(size($"embedding")).as("hi"))
      .collect()(0)
    val r = dimSpread(spark.read.parquet(s"$sfDir/embeddings.parquet"))
    assert(r.getInt(0) == r.getInt(1),
      s"embeddings fixture is dimension-ragged (${r.getInt(0)}..${r.getInt(1)}) " +
        "— q344/q345's fixed-dimension precondition is void")
    val ragged = Seq(Array(1.0f, 2.0f), Array(1.0f, 2.0f, 3.0f))
      .toDF("embedding")
    val p = dimSpread(ragged)
    assert(p.getInt(0) != p.getInt(1), "planted ragged corpus must differ")
  }

  test("decimal(38,0) fold numerators are non-NULL (silent-overflow gate)") {
    // Beyond the documented envelopes the two engines fail DIFFERENTLY
    // (r17 ADVICE): a Spark decimal(38,0) fold that overflows under
    // non-ANSI mode silently yields NULL, while the DuckDB HUGEINT oracle
    // errors loudly — an out-of-envelope corpus would surface as a
    // confusing hash/NULL mismatch. Gate the digit-string numerators (and
    // q363's ari, whose ari_num/ari_den are d38 intermediates) by name so
    // a silent Spark-side overflow trips HERE first.
    Seq(
      "q356_cvm_drift_stat" -> Seq("cvm_num"),
      "q365_mann_whitney_u" -> Seq("tie_term"),
      "q369_acf_daily_revenue" -> Seq("cov_num"),
      "q363_adjusted_rand_index" -> Seq("ari")
    ).foreach { case (name, cols) =>
      val df = run(name).select(cols.map(col): _*)
      cols.foreach { c =>
        val nNull = df.filter(col(c).isNull).count()
        assert(nNull == 0L, s"$name.$c: $nNull NULL(s) — the silent " +
          "decimal(38,0) overflow signature (oracle would have errored)")
      }
    }
  }

  test("wrap-symptom scan over the non-negative-by-construction census family") {
    // Counts, token totals, shard stats, blast radii: all non-negative by
    // construction; a negative long anywhere is an overflow signature.
    Seq(
      "q324_shard_manifest" -> Seq("n_docs", "sum_tok", "n_bins"),
      "q326_deletion_cascade" -> Seq("n_cust_deleted", "n_orders_deleted",
        "n_lineitems_deleted", "revenue_cents_delta"),
      "q288_bfs_reachability" -> Seq("n_reachable_3hop"),
      "q98_pack_sequences" -> Seq("n_docs", "sum_tok"),
      "q331_k_anonymity_census" -> Seq("n_rows", "l_div", "k_anonymity",
        "l_diversity", "n_groups_below_k"),
      "q332_ks_drift_stat" -> Seq("n_a", "n_b", "ks_num"),
      "q333_entity_linkage" -> Seq("n_pairs", "n_blocks", "n_blocks_skipped"),
      "q335_conformal_threshold" -> Seq("n_cal", "k_rank", "n_test", "n_covered"),
      // round-16 additions: fixed-point ranks, census counts, exact
      // squared distances — all non-negative by construction
      "q337_kcore_peel_census" -> Seq("k", "n_nodes", "n_edges"),
      "q338_hits_scores" -> Seq("score"),
      "q339_dp_noised_histogram" -> Seq("n_noised"),
      "q340_kaplan_meier" -> Seq("n_risk", "n_events", "n_censored"),
      "q342_apriori_rules" -> Seq("n_ante", "n_cons", "n_both"),
      "q345_dbscan_grid" -> Seq("n_core", "n_border", "n_points"),
      "q349_textrank_keywords" -> Seq("pr"),
      "q353_motif_discord" -> Seq("dist2_dollars"),
      // round-17 additions: census counts, doubled pair sums, EMD
      // numerators, rank sums — non-negative by construction
      "q356_cvm_drift_stat" -> Seq("n_a", "n_b"),
      "q357_t_closeness_census" -> Seq("n_rows", "emd_num", "n_cells_above"),
      "q359_entity_canonicalization" -> Seq("n_entities",
        "sum_golden_name_len", "n_merged_records"),
      "q360_unigram_lm_tokenizer" -> Seq("usage", "cost_bits", "n_pieces"),
      "q362_rbo_index_fidelity" -> Seq("overlap_at_10", "rbo_scaled"),
      "q363_adjusted_rand_index" -> Seq("s2ij", "s2a", "s2b"),
      "q364_cohens_kappa" -> Seq("n_docs", "n_scored", "n_agree",
        "n_unscored", "n_foreign"),
      "q365_mann_whitney_u" -> Seq("n_a", "n_b", "u2_a")
    ).foreach { case (name, cols) =>
      assertNoWrap(run(name).select(cols.map(col): _*), name)
    }
  }
}
