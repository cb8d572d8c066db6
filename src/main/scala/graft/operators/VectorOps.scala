package graft.operators

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions

/** Embedding-vector operators over `array<float>` columns.
  *
  * Arithmetic contract (oracle-portable and cluster-reproducible): products
  * are computed in FLOAT (same rounding both engines), then folded
  * left-to-right into a DOUBLE accumulator — a fixed sequential order, so
  * results are bit-identical regardless of partitioning.
  *
  * Two implementations with the identical contract: the native Catalyst
  * expression [[graft.functions.FloatVecDot]] (whole-stage codegen, tight
  * primitive loop — the default when [[graft.functions.GraftExtensions]] is
  * installed) and a higher-order-function fallback that works in any
  * session. [[dot]]/[[cosine]] dispatch on registration so results never
  * depend on which path ran.
  *
  * Scale path: brute-force cosine is O(|Q|·N·d) — fine for a bounded query
  * set; the sign-LSH bucket key ([[signKey]]) turns all-pairs similarity
  * into an equi-join on a short string key, which Spark executes as an
  * ordinary shuffled hash join (candidates only within buckets).
  */
object VectorOps {

  /** Dot product, HOF fallback: float multiplies, left-to-right double fold. */
  def dotF(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, p) => acc + p)

  def normSq(a: Column): Column = dotF(a, a)

  /** Dot product: native codegen expression when registered, HOF otherwise. */
  def dot(s: SparkSession)(a: Column, b: Column): Column =
    if (s.catalog.functionExists(GraftFunctions.vecDotName))
      call_function(GraftFunctions.vecDotName, a, b)
    else dotF(a, b)

  /** Integer dot Σaᵢbᵢ over `array<int>`, HOF fallback (exact BIGINT). */
  def dotIF(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("long") * y), lit(0L),
      (acc, p) => acc + p)

  /** Integer squared distance Σ(aᵢ−bᵢ)², HOF fallback (exact BIGINT). */
  def sqDistIF(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) =>
      (x.cast("long") - y) * (x.cast("long") - y)), lit(0L),
      (acc, p) => acc + p)

  /** Integer dot: native codegen kernel when registered, HOF otherwise —
    * identical exact-BIGINT result either way. */
  def dotI(s: SparkSession)(a: Column, b: Column): Column =
    if (s.catalog.functionExists(GraftFunctions.intDotName))
      call_function(GraftFunctions.intDotName, a, b)
    else dotIF(a, b)

  /** Integer squared distance, dispatched like [[dotI]]. */
  def sqDistI(s: SparkSession)(a: Column, b: Column): Column =
    if (s.catalog.functionExists(GraftFunctions.intSqDistName))
      call_function(GraftFunctions.intSqDistName, a, b)
    else sqDistIF(a, b)

  /** Per-vector symmetric int8 quantization, HOF fallback: the exact q78
    * op tree (absmax double fold → scale → floor(x/scale + 0.5)). */
  def quantizeI8F(a: Column): Column = {
    val absmax = aggregate(transform(a, x => abs(x)), lit(0.0),
      (acc, x) => when(x > acc, x).otherwise(acc))
    val scale = when(absmax === 0.0, lit(1.0)).otherwise(absmax / lit(127.0))
    transform(a, x => floor(x / scale + lit(0.5)).cast("int"))
  }

  /** Quantization dispatched like [[dotI]]: one compiled pass when the
    * native expression is registered, the HOF chain otherwise. */
  def quantizeI8(s: SparkSession)(a: Column): Column =
    if (s.catalog.functionExists(GraftFunctions.quantizeI8Name))
      call_function(GraftFunctions.quantizeI8Name, a)
    else quantizeI8F(a)

  /** Cosine similarity with a fixed op tree: dot / (sqrt(na) * sqrt(nb)). */
  def cosine(a: Column, b: Column): Column =
    dotF(a, b) / (sqrt(normSq(a)) * sqrt(normSq(b)))

  /** Cosine via the dispatched dot — same op tree, native when available. */
  def cosine(s: SparkSession)(a: Column, b: Column): Column = {
    def d(x: Column, y: Column) = dot(s)(x, y)
    d(a, b) / (sqrt(d(a, a)) * sqrt(d(b, b)))
  }

  /** Sign-LSH bucket key from the first `bits` coordinates (axis-aligned
    * hyperplanes): '1'/'0' string, e.g. "10110010". */
  def signKey(a: Column, bits: Int): Column = signKeyFrom(a, 1, bits)

  /** Sign key over coordinates [start, start+bits) (1-based start). */
  def signKeyFrom(a: Column, start: Int, bits: Int): Column =
    concat_ws("", transform(slice(a, start, bits), x =>
      when(x >= 0, lit("1")).otherwise(lit("0"))))

  /** Multi-band sign-LSH: `bands` disjoint groups of `bits` coordinates
    * each, OR-construction — a pair is a candidate if it collides in ANY
    * band. This is how sign-LSH scales with N: a single fixed-width key
    * (e.g. 8 bits = 256 buckets) leaves ~N/256 vectors per bucket and the
    * in-bucket pairing is still quadratic at corpus scale; wider keys
    * (16–24 bits → 65k–16M buckets) keep buckets near-constant size, and
    * multiple bands buy back the recall the wider key costs (a true
    * near-dup that flips one sign in band 0 still collides in band 1).
    * Returns array<struct<band:int, key:string>> ready to explode. */
  def signBandKeys(a: Column, bits: Int, bands: Int): Column =
    array((0 until bands).map { b =>
      struct(lit(b).as("band"), signKeyFrom(a, b * bits + 1, bits).as("key"))
    }: _*)
}
