package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst expression for the float-vector dot product — the hot
  * scalar of every similarity/ANN path. Lives in the graftshim package
  * because `AbstractDataType` (ExpectsInputTypes) and `ExpressionUtils`
  * (Expression → Column) are `private[sql]`; the public API surface is
  * `graft.functions.GraftFunctions`.
  *
  * The higher-order-function form (`aggregate(zip_with(a, b, _*_), 0.0,
  * _+_)`) is semantically identical but interpreted: per element it
  * allocates lambda variables and walks the fold through non-codegen'd
  * eval. This expression generates a tight primitive loop inside
  * whole-stage codegen — the preference-order case from SURVEY §7.3
  * where a built-in composition exists but a native `Expression` with
  * `doGenCode` is the right cost model at scale.
  *
  * Semantics (kept bit-identical to the HOF form and the DuckDB oracle's
  * `list_sum(list_transform(list_zip(...)))`):
  * acc = ((0.0 + a0·b0) + a1·b1) + … — a sequential left fold in double
  * space, one IEEE multiply and add per element, in element order.
  * Mismatched lengths → null (zip_with would pad with null and poison
  * the fold to null). Null elements are not expected (embedding vectors
  * are dense); a null input array → null via standard null-intolerance.
  */
case class FloatVectorDot(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(FloatType), ArrayType(FloatType))

  override def dataType: DataType = DoubleType

  override def nullable: Boolean = true

  override def prettyName: String = "vec_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val (arrA, arrB) = (a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    val n = arrA.numElements()
    if (n != arrB.numElements()) null
    else {
      var acc = 0.0
      var i = 0
      while (i < n) {
        acc += arrA.getFloat(i).toDouble * arrB.getFloat(i).toDouble
        i += 1
      }
      acc
    }
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |final int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $acc += (double) $a.getFloat($i) * (double) $b.getFloat($i);
         |  }
         |  ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FloatVectorDot =
    copy(left = newLeft, right = newRight)
}

object VectorExpressions {

  val descriptions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] =
    Seq(
      (
        new FunctionIdentifier("vec_dot"),
        new ExpressionInfo(classOf[FloatVectorDot].getName, "vec_dot"),
        (args: Seq[Expression]) => {
          require(args.length == 2, "vec_dot takes exactly 2 arguments")
          FloatVectorDot(args.head, args(1))
        }),
      // SURVEY §2.8: the reference's one converter fn, SQL-callable —
      // strip_excel(s) ≡ btrim(s, '"=') (strip Excel ="0123" artifacts).
      // Resolves to the builtin StringTrimBoth, so it codegens like any
      // btrim call; registration just gives it the reference's name.
      (
        new FunctionIdentifier("strip_excel"),
        new ExpressionInfo(
          classOf[org.apache.spark.sql.catalyst.expressions.StringTrimBoth].getName,
          "strip_excel"),
        (args: Seq[Expression]) => {
          require(args.length == 1, "strip_excel takes exactly 1 argument")
          new org.apache.spark.sql.catalyst.expressions.StringTrimBoth(
            args.head,
            org.apache.spark.sql.catalyst.expressions.Literal("\"="))
        }))

  def vecDot(a: Column, b: Column): Column =
    ExpressionUtils.column(FloatVectorDot(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b)))
}
