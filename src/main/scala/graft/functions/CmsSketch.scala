package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, DecimalType, LongType}
import org.apache.spark.util.sketch.CountMinSketch

/** Deserialization + point query for a serialized
  * [[org.apache.spark.util.sketch.CountMinSketch]] (the binary Spark's
  * native `count_min_sketch` aggregate emits).
  *
  * Spark ships the BUILD side as a SQL aggregate but exposes no probe —
  * the estimate never leaves the binary without this expression (the same
  * gap [[GraftFunctions.bloomProbeName]] fills for bloom filters, except
  * there Spark had an internal expression to re-register; here the probe
  * is genuinely missing). Long-key contract, mirroring the aggregate's
  * integral path: callers probe with the SAME column type they built with.
  *
  * Cost note: each evaluation deserializes the sketch (`readFrom` of a
  * ~depth·width·8 B buffer). That is the correct trade for this
  * expression's intended shape — a BOUNDED panel of probe keys against a
  * broadcast 1-row sketch (q292: 10 rows) — and why the scaladoc of the
  * declared query keeps the probe side panel-bounded rather than probing
  * the full key stream. Bulk probing would want a reference-cached
  * deserialization, which the bounded contract makes unnecessary.
  */
case class CmsEstimate(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes = Seq(BinaryType, LongType)

  override def dataType: DataType = LongType

  override def prettyName: String = "graft_cms_estimate"

  override protected def nullSafeEval(sk: Any, item: Any): Any =
    CmsEstimateHelper.estimate(sk.asInstanceOf[Array[Byte]],
      item.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (sk, it) =>
      s"graft.functions.CmsEstimateHelper.estimate($sk, $it)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Static helper so both the interpreted and generated paths run the one
  * implementation (and Janino resolves a plain static-style call — the
  * Media.scala lesson: private/nested Scala shapes break codegen). */
object CmsEstimateHelper {
  def estimate(bytes: Array[Byte], item: Long): Long =
    CountMinSketch.readFrom(new java.io.ByteArrayInputStream(bytes))
      .estimateCount(java.lang.Long.valueOf(item))
}

/** Join-size (inner-product) estimate from TWO serialized count-min
  * sketches: est = min over rows d of Σ_w A[d][w]·B[d][w] — the classic
  * AMS/CM cardinality estimator for |R ⋈_k S| (Cormode & Muthukrishnan,
  * "An improved data stream summary: the count-min sketch and its
  * applications", J. Algorithms 2005, §4.2). Never underestimates (every
  * true join pair lands in the same cell of every row), and overshoots by
  * at most ε·N_A·N_B with probability 1−δ.
  *
  * The sketches must come from the SAME family — equal depth, width, and
  * per-row hash coefficients (i.e. built by `count_min_sketch` with the
  * same eps/confidence/seed) — or the cell-wise product is meaningless;
  * the helper enforces it structurally from the serialized bytes rather
  * than trusting the caller.
  *
  * Spark's public [[CountMinSketch]] API exposes point estimates only, so
  * the inner product reads the serialized form directly. The layout is
  * fixed by the on-disk compatibility contract of `writeTo` (version 1:
  * int version, long totalCount, int depth, int width, long hashA[depth],
  * long table[depth][width]) and the parse self-checks: every table row
  * of a CMS sums to totalCount, so a layout drift cannot pass silently.
  *
  * Output is Decimal(38,0): cell products are count×count — at 100 TB
  * each count can approach 2^40 and the row sum crosses 2^63, so the fold
  * runs in BigInteger and surfaces as exact decimal (the q197/q203
  * promotion rule applied inside the expression).
  */
case class CmsInnerProduct(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes = Seq(BinaryType, BinaryType)

  override def dataType: DataType = DecimalType(38, 0)

  override def prettyName: String = "graft_cms_inner_product"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    CmsInnerProductHelper.inner(a.asInstanceOf[Array[Byte]],
      b.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.CmsInnerProductHelper.inner($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object CmsInnerProductHelper {
  private final case class Parsed(
      total: Long, depth: Int, width: Int,
      hashA: Array[Long], table: Array[Array[Long]])

  private def parse(bytes: Array[Byte]): Parsed = {
    val in = new java.io.DataInputStream(
      new java.io.ByteArrayInputStream(bytes))
    val ver = in.readInt()
    require(ver == 1, s"unsupported CountMinSketch serial version $ver")
    val total = in.readLong()
    val depth = in.readInt()
    val width = in.readInt()
    require(depth > 0 && width > 0 && depth <= 64 && width <= (1 << 24),
      s"implausible CMS shape depth=$depth width=$width")
    require(bytes.length == 20L + 8L * depth + 8L * depth * width,
      s"CMS byte length ${bytes.length} does not match shape " +
        s"depth=$depth width=$width")
    val hashA = Array.fill(depth)(in.readLong())
    val table = Array.fill(depth) {
      val row = Array.fill(width)(in.readLong())
      row
    }
    // Structural self-check: each CMS row is a partition of the input
    // stream, so its counters must sum to totalCount — a serialized-layout
    // drift (or corrupted buffer) fails loudly instead of estimating junk.
    var d = 0
    while (d < depth) {
      var s = 0L; var w = 0
      while (w < width) { s += table(d)(w); w += 1 }
      require(s == total,
        s"CMS row $d sums to $s but totalCount is $total — " +
          "layout drift or corrupt sketch")
      d += 1
    }
    Parsed(total, depth, width, hashA, table)
  }

  def inner(a: Array[Byte], b: Array[Byte]): org.apache.spark.sql.types.Decimal = {
    val pa = parse(a)
    val pb = parse(b)
    require(pa.depth == pb.depth && pa.width == pb.width,
      s"CMS shape mismatch: ${pa.depth}x${pa.width} vs ${pb.depth}x${pb.width}")
    require(java.util.Arrays.equals(pa.hashA, pb.hashA),
      "CMS hash-family mismatch: sketches were built with different seeds " +
        "and their cells are not comparable")
    var best: java.math.BigInteger = null
    var d = 0
    while (d < pa.depth) {
      var acc = java.math.BigInteger.ZERO
      var w = 0
      while (w < pa.width) {
        val x = pa.table(d)(w); val y = pb.table(d)(w)
        if (x != 0L && y != 0L) {
          if (((x | y) >>> 31) == 0L) {
            // common case: both counters < 2^31 → product < 2^62 fits a
            // long — avoid BigInteger churn in the scan
            acc = acc.add(java.math.BigInteger.valueOf(x * y))
          } else {
            acc = acc.add(java.math.BigInteger.valueOf(x)
              .multiply(java.math.BigInteger.valueOf(y)))
          }
        }
        w += 1
      }
      if (best == null || acc.compareTo(best) < 0) best = acc
      d += 1
    }
    org.apache.spark.sql.types.Decimal(scala.math.BigDecimal(
      new java.math.BigDecimal(best)), 38, 0)
  }
}
