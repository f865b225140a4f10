package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.graftshim.VectorExpressions

/** Registration surface for graft's native functions (the expressions
  * themselves live in [[org.apache.spark.sql.graftshim]] — see
  * [[org.apache.spark.sql.graftshim.FloatVectorDot]]): either install
  * them per-session ([[GraftFunctions.register]]) or configure
  * `spark.sql.extensions=graft.functions.GraftExtensions` so every
  * session on the cluster gets them. After either, `vec_dot` is callable
  * from SQL text and via `functions.call_function("vec_dot", a, b)`. */
object GraftFunctions {

  private def all =
    VectorExpressions.descriptions ++
      org.apache.spark.sql.graftshim.TextExpressionDescriptions.descriptions

  def register(spark: SparkSession): Unit =
    all.foreach { case (ident, info, builder) =>
      spark.sessionState.functionRegistry
        .registerFunction(ident, info, builder)
    }

  /** Column-API entry point (bypasses the registry). */
  def vecDot(a: Column, b: Column): Column = VectorExpressions.vecDot(a, b)
}

/** `spark.sql.extensions` hook (SparkSessionExtensions — the supported
  * cluster-wide injection point for custom expressions/rules). */
class GraftExtensions extends (org.apache.spark.sql.SparkSessionExtensions => Unit) {
  override def apply(ext: org.apache.spark.sql.SparkSessionExtensions): Unit =
    (VectorExpressions.descriptions ++
      org.apache.spark.sql.graftshim.TextExpressionDescriptions.descriptions)
      .foreach(ext.injectFunction)
}
