package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Winnowing document fingerprints (the MOSS scheme: Schleimer, Wilkerson
  * & Aiken, SIGMOD'03): a rolling polynomial hash over character
  * k-grams, then the minimum of each sliding window of `w` consecutive
  * hashes; the DISTINCT minima are the document's fingerprint set —
  * position-robust (an insertion only perturbs nearby windows) and
  * guaranteed to share fingerprints with any document overlapping by
  * ≥ w + k - 1 characters.
  *
  * The hash is pure integer arithmetic — Horner's rule mod a prime —
  * so the ORACLE can replay it exactly in SQL (the driver checks this
  * query hash-green); case folding is done arithmetically (A-Z → +32)
  * for the same reason. Tail windows shorter than `w` are included
  * (matches the oracle's `ROWS BETWEEN CURRENT ROW AND w-1 FOLLOWING`
  * window frame, which shrinks at the end of the partition).
  *
  * Output: sorted distinct fingerprint hashes. Texts shorter than k
  * code points have no k-grams → empty array.
  */
case class WinnowFingerprints(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)

  override def dataType: DataType =
    ArrayType(LongType, containsNull = false)

  override def nullable: Boolean = true

  override def prettyName: String = "winnow_fingerprints"

  override def nullSafeEval(input: Any): Any =
    WinnowFingerprints.compute(input.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = " +
        s"org.apache.spark.sql.graftshim.WinnowFingerprints.compute($c);")

  override protected def withNewChildInternal(
      newChild: Expression): WinnowFingerprints = copy(child = newChild)
}

object WinnowFingerprints {

  /** k-gram width (chars), winnow window, hash base, prime modulus —
    * shared verbatim by the oracle SQL builder in Dedup. */
  val K = 8
  val W = 4
  val B = 257L
  val M = 1000003L

  def compute(s: UTF8String): ArrayData = {
    val str = s.toString
    val n = str.codePointCount(0, str.length)
    val cps = new Array[Long](n)
    var (i, j) = (0, 0)
    while (i < str.length) {
      val cp = str.codePointAt(i)
      cps(j) = if (cp >= 65 && cp <= 90) cp + 32L else cp.toLong
      j += 1
      i += Character.charCount(cp)
    }
    val m = n - K + 1
    if (m <= 0) return new GenericArrayData(Array.empty[Any])
    // Horner per position (k multiply-adds; k is small and this keeps
    // the arithmetic IDENTICAL to the oracle's nested expression)
    val h = new Array[Long](m)
    var p = 0
    while (p < m) {
      var acc = 0L
      var q = 0
      while (q < K) { acc = (acc * B + cps(p + q)) % M; q += 1 }
      h(p) = acc
      p += 1
    }
    val fps = new java.util.TreeSet[java.lang.Long]()
    p = 0
    while (p < m) {
      var mn = h(p)
      var q = p + 1
      val end = math.min(p + W, m)
      while (q < end) { if (h(q) < mn) mn = h(q); q += 1 }
      fps.add(mn)
      p += 1
    }
    val out = new Array[Any](fps.size())
    var idx = 0
    val it = fps.iterator()
    while (it.hasNext) { out(idx) = it.next().longValue(); idx += 1 }
    new GenericArrayData(out)
  }

  def winnowFingerprints(c: Column): Column =
    ExpressionUtils.column(WinnowFingerprints(ExpressionUtils.expression(c)))
}
