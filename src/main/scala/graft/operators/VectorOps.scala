package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Embedding-vector operators over `array<float>` columns.
  *
  * Arithmetic contract (oracle-portable and cluster-reproducible): products
  * are computed in FLOAT (same rounding both engines), then folded
  * left-to-right into a DOUBLE accumulator — a fixed sequential order, so
  * results are bit-identical regardless of partitioning. All higher-order
  * functions codegen; no UDFs.
  *
  * Scale path: brute-force cosine is O(|Q|·N·d) — fine for a bounded query
  * set; the sign-LSH bucket key ([[signKey]]) turns all-pairs similarity
  * into an equi-join on a short string key, which Spark executes as an
  * ordinary shuffled hash join (candidates only within buckets).
  */
object VectorOps {

  /** Dot product: float multiplies, left-to-right double fold. */
  def dotF(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, p) => acc + p)

  def normSq(a: Column): Column = dotF(a, a)

  /** Cosine similarity with a fixed op tree: dot / (sqrt(na) * sqrt(nb)). */
  def cosine(a: Column, b: Column): Column =
    dotF(a, b) / (sqrt(normSq(a)) * sqrt(normSq(b)))

  /** Sign-LSH bucket key from the first `bits` coordinates (axis-aligned
    * hyperplanes): '1'/'0' string, e.g. "10110010". */
  def signKey(a: Column, bits: Int): Column =
    concat_ws("", transform(slice(a, 1, bits), x =>
      when(x >= 0, lit("1")).otherwise(lit("0"))))
}
