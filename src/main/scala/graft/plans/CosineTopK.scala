package graft.plans

import scala.collection.mutable

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, AttributeSet, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan}
import org.apache.spark.sql.types.{DataType, DoubleType, IntegerType, LongType}

/** Whole-operator custom plan for cosine top-k similarity search
  * (SURVEY.md §4.3's "one defensible custom physical rule").
  *
  * The composed formulation (join + window row_number, q45) materializes
  * |Q|·N joined rows, shuffles them all on qid, and sorts each window
  * partition. This operator keeps a bounded heap per query *inside each
  * candidate partition* and shuffles only the per-partition partial top-k
  * — numPartitions·|Q|·k tiny rows — before an exact merge. At 100 TB
  * that's the difference between shuffling the corpus and shuffling
  * kilobytes; the scan side stays wherever it was partitioned.
  *
  * Contract (enforced by [[SimilarityOps.cosineTopK]]): queries child
  * outputs (qid: bigint, qe: array<float>) and is bounded (it is collected
  * and broadcast — same assumption `broadcast(q)` makes in q45);
  * candidates child outputs (vid: bigint, ve: array<float>). Arithmetic is
  * the engine-wide contract: float products, left-to-right double fold —
  * results bit-match the declared-query formulation and the DuckDB oracle.
  * Self-pairs (qid == vid) are excluded; ties break on smaller vid,
  * exactly like `row_number() OVER (ORDER BY cos DESC, vid ASC)`; a
  * zero-norm vector's undefined cosine surfaces as null ranked last,
  * matching the composed form's divide-by-zero null under nulls-last
  * DESC ordering.
  */
case class CosineTopK(
    queries: LogicalPlan,
    candidates: LogicalPlan,
    k: Int,
    // constructor parameter, NOT a val in the body: expression IDs must
    // survive tree copies (withNewChildrenInternal) or parents' references
    // dangle at execution.
    output: Seq[Attribute] = CosineTopK.freshOutput())
    extends BinaryNode {
  override def left: LogicalPlan = queries
  override def right: LogicalPlan = candidates

  // The output attrs are generated here, not passed through from children.
  override def producedAttributes: AttributeSet = AttributeSet(output)

  // The operator reads every child column (id, vector) — without this,
  // `references` is empty and ColumnPruning's generic case inserts empty
  // Projects under the node: the children then emit 0-field rows and
  // doExecute's field reads walk off into unmapped memory (SIGSEGV via
  // Unsafe). A custom node must declare its child-column consumption.
  override def references: AttributeSet =
    AttributeSet(queries.output ++ candidates.output)

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): LogicalPlan =
    copy(queries = newLeft, candidates = newRight)
}

object CosineTopK {
  def freshOutput(): Seq[Attribute] = Seq(
    AttributeReference("qid", LongType, nullable = false)(),
    AttributeReference("rn", IntegerType, nullable = false)(),
    AttributeReference("vid", LongType, nullable = false)(),
    // nullable: a zero-norm vector has no defined cosine — emitted as null,
    // exactly like Spark's (non-ANSI) 0/0 divide in the composed form.
    AttributeReference("cos", DoubleType, nullable = true)())
}

case class CosineTopKExec(
    k: Int,
    queries: SparkPlan,
    candidates: SparkPlan,
    output: Seq[Attribute]) extends BinaryExecNode {

  override def left: SparkPlan = queries
  override def right: SparkPlan = candidates

  override def producedAttributes: AttributeSet = AttributeSet(output)

  protected override def doExecute(): RDD[InternalRow] = {
    // Localize everything the closures need: capturing `this` would
    // serialize the whole plan tree into every task.
    val kk = k
    val qRows: Array[(Long, Array[Float])] = queries.executeCollect().map { r =>
      (r.getLong(0), r.getArray(1).toFloatArray())
    }
    val candRdd = candidates.execute()
    val bc = candRdd.sparkContext.broadcast(qRows)
    val worstFirst = CosineTopKExec.worstFirst

    val partials: RDD[(Long, (Double, Long))] = candRdd.mapPartitions { iter =>
      val qs = bc.value
      val heaps = qs.map { case (qid, _) =>
        qid -> new mutable.PriorityQueue[(Double, Long)]()(worstFirst)
      }.toMap
      iter.foreach { row =>
        val vid = row.getLong(0)
        val ve = row.getArray(1).toFloatArray()
        var j = 0
        while (j < qs.length) {
          val (qid, qe) = qs(j)
          if (qid != vid) {
            val c = CosineTopKExec.cosine(qe, ve)
            val h = heaps(qid)
            if (h.size < kk) h.enqueue((c, vid))
            else if (worstFirst.lt((c, vid), h.head)) { h.dequeue(); h.enqueue((c, vid)) }
          }
          j += 1
        }
      }
      heaps.iterator.flatMap { case (qid, h) => h.iterator.map(e => (qid, e)) }
    }

    val mergeParts = math.max(1, math.min(candRdd.getNumPartitions, qRows.length))
    partials.groupByKey(mergeParts).mapPartitions { it =>
      val proj = UnsafeProjection.create(
        Array[DataType](LongType, IntegerType, LongType, DoubleType))
      it.flatMap { case (qid, es) =>
        // ascending by worstFirst = best-first ("less" = better cos)
        es.toSeq.sorted(CosineTopKExec.worstFirst).take(kk)
          .zipWithIndex.map { case ((cos, vid), i) =>
            val cosOrNull: Any = if (cos.isNaN) null else cos
            proj(InternalRow(qid, i + 1, vid, cosOrNull)).copy(): InternalRow
          }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): SparkPlan =
    copy(queries = newLeft, candidates = newRight)
}

object CosineTopKExec {
  /** Same float-mul / double-fold tree as FloatVecDot and the HOF form. */
  def cosine(a: Array[Float], b: Array[Float]): Double = {
    val n = math.min(a.length, b.length)
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      dot += (a(i) * b(i)).toDouble
      na += (a(i) * a(i)).toDouble
      nb += (b(i) * b(i)).toDouble
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  /** Evict-worst ordering: "greater" = worse = lower cos, ties on larger
    * vid. NaN here encodes an UNDEFINED cosine (zero-norm input): the
    * composed Spark formulation produces null for it (non-ANSI 0/0 divide)
    * and `ORDER BY cos DESC` puts nulls last — so undefined ranks strictly
    * worst. A naive Double.compare would instead rank NaN as the largest
    * cosine (rank 1), silently diverging from the join+window form. */
  val worstFirst: Ordering[(Double, Long)] = new Ordering[(Double, Long)] {
    override def compare(a: (Double, Long), b: (Double, Long)): Int = {
      val an = a._1.isNaN; val bn = b._1.isNaN
      if (an != bn) { if (an) 1 else -1 }
      else {
        val c = java.lang.Double.compare(b._1, a._1)
        if (c != 0) c else java.lang.Long.compare(a._2, b._2)
      }
    }
  }
}
