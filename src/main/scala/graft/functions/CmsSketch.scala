package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}
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
