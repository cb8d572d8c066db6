package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.DateTimeUtils
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.pipeline.Listings

/** Catalyst Generator (UDTF) for the reference's document→rows explosion:
  * one (fileName, html) input row yields N listing rows — the `find_all`
  * at /root/reference/download_lambda.py:88 as a first-class plan node.
  *
  * This is the same pure extraction as [[graft.pipeline.Listings
  * .extractListings]] (the `flatMap` form); as a Generator it plans as
  * `Generate ExtractListingsExpr(...)`, composing with projections and
  * filters in DataFrame/SQL space instead of dropping to the typed API —
  * e.g. `selectExpr("graft_extract_listings(file, value) AS l")` or
  * `LATERAL VIEW`. Generators evaluate per input row on executors
  * (CodegenFallback is normal for generators; the parse itself dominates).
  */
case class ExtractListingsExpr(fileName: Expression, html: Expression)
    extends Generator with CodegenFallback {

  override def children: Seq[Expression] = Seq(fileName, html)

  override def elementSchema: StructType = StructType(Seq(
    StructField("FechaDescarga", DateType, nullable = false),
    StructField("Barrio", StringType),
    StructField("Valor", StringType),
    StructField("NumHabitaciones", IntegerType),
    StructField("NumBanos", IntegerType),
    StructField("mts2", DoubleType)))

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val fn = fileName.eval(input).asInstanceOf[UTF8String]
    val doc = html.eval(input).asInstanceOf[UTF8String]
    if (fn == null || doc == null) Nil
    else Listings.extractListings(fn.toString, doc.toString).map { l =>
      InternalRow(
        DateTimeUtils.fromJavaDate(l.FechaDescarga),
        l.Barrio.map(UTF8String.fromString).orNull,
        l.Valor.map(UTF8String.fromString).orNull,
        l.NumHabitaciones.map(Int.box).orNull,
        l.NumBanos.map(Int.box).orNull,
        l.mts2.map(Double.box).orNull)
    }
  }

  override def prettyName: String = "graft_extract_listings"

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(fileName = newChildren(0), html = newChildren(1))
}
