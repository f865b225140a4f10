package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, IntegerType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Per-document character-trigram HISTOGRAM as one native expression:
  * `trigram_counts(text)` → array<struct<dim:int, c:bigint>> with
  * dim = cp₁·2¹⁴ + cp₂·2⁷ + cp₃ over consecutive code points (the same
  * dim formula as the embed-dedup oracle; injective for 7-bit chars).
  *
  * This replaces two pipeline stages of `q_dedup_embed`: the
  * interpreted HOF dim extraction (zip_with over three shifted char
  * slices) AND the corpus-scale groupBy(doc, dim) — the histogram is
  * the map-side combine, done inside the expression, so the downstream
  * explode emits pre-aggregated (dim, count) rows and the first shuffle
  * the query needs is the (much smaller) docfreq aggregation. Measured
  * 3.2 s → see DESIGN.md.
  *
  * Output order is ascending dim (deterministic; downstream is
  * order-insensitive group-bys anyway). Arithmetic is Java int (wraps
  * identically to Spark's `ascii()*16384+…` int math); the oracle-parity
  * precondition is 7-bit text, as documented on the query.
  */
case class TrigramCounts(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("dim", IntegerType, nullable = false),
      StructField("c", LongType, nullable = false))),
    containsNull = false)

  override def nullable: Boolean = true

  override def prettyName: String = "trigram_counts"

  override def nullSafeEval(input: Any): Any =
    TrigramCounts.compute(input.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = org.apache.spark.sql.graftshim.TrigramCounts.compute($c);")

  override protected def withNewChildInternal(
      newChild: Expression): TrigramCounts = copy(child = newChild)
}

object TrigramCounts {

  /** Static entry point shared by interpreted eval and generated code. */
  def compute(s: UTF8String): ArrayData = {
    val str = s.toString
    val n = str.codePointCount(0, str.length)
    val cps = new Array[Int](n)
    var (i, j) = (0, 0)
    while (i < str.length) {
      val cp = str.codePointAt(i)
      cps(j) = cp; j += 1
      i += Character.charCount(cp)
    }
    val hist = new java.util.TreeMap[Integer, java.lang.Long]()
    var k = 0
    while (k + 2 < n) {
      val dim = cps(k) * 16384 + cps(k + 1) * 128 + cps(k + 2)
      val prev = hist.get(dim)
      hist.put(dim, if (prev == null) 1L else prev.longValue() + 1L)
      k += 1
    }
    val out = new Array[Any](hist.size())
    var idx = 0
    val it = hist.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      out(idx) = InternalRow(e.getKey.intValue(), e.getValue.longValue())
      idx += 1
    }
    new GenericArrayData(out)
  }

  def trigramCounts(c: Column): Column =
    ExpressionUtils.column(TrigramCounts(ExpressionUtils.expression(c)))
}
