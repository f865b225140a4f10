package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import graft.operators.PrefixSum

/** The scalable running total must agree exactly with the
  * single-partition `SUM OVER (ORDER BY …)` window it replaces. */
class PrefixSumSpec extends SparkSpec {
  import spark.implicits._

  test("matches SUM() OVER (ORDER BY ...) including ties and zeros") {
    val df = Seq(
      ("b", 2, 10L), ("a", 1, 5L), ("a", 2, 0L),
      ("c", 1, 7L), ("b", 1, 3L))
      .toDF("k", "n", "v").repartition(4)
    val keys = Seq(col("k"), col("n"))
    val scalable = PrefixSum.withRunningTotal(df, keys, "v", "cum")
      .select("k", "n", "v", "cum").collect().map(_.toSeq).toSet
    val window = df.withColumn("cum",
      sum(col("v")).over(Window.orderBy(keys: _*)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select("k", "n", "v", "cum").collect().map(_.toSeq).toSet
    assert(scalable === window)
  }

  test("property: equals the window formulation across generated data") {
    val rows = Gen.listOf(Gen.zip(Gen.chooseNum(0, 50), Gen.chooseNum(0L, 100L)))
    forAllSamples(rows, 15) { data =>
      if (data.nonEmpty) {
        // (key, value); key may repeat -> value must join the sort for a
        // total order (same contract as production callers)
        val df = data.zipWithIndex
          .map { case ((k, v), i) => (k, i.toLong, v) }
          .toDF("k", "i", "v").repartition(5)
        val keys = Seq(col("k"), col("i"))
        val got = PrefixSum.withRunningTotal(df, keys, "v", "cum")
          .orderBy("k", "i").select("cum").as[Long].collect().toSeq
        val want = data.zipWithIndex
          .map { case ((k, v), i) => (k, i.toLong, v) }
          .sortBy(t => (t._1, t._2)).map(_._3)
          .scanLeft(0L)(_ + _).drop(1)
        assert(got === want)
      }
    }
  }

  test("multi-column: k running totals off one sort match k windows") {
    val df = Seq(
      ("b", 2, 10L, 1), ("a", 1, 5L, 0), ("a", 2, 0L, 1),
      ("c", 1, 7L, 1), ("b", 1, 3L, 0))
      .toDF("k", "n", "v", "w").repartition(4)
    val keys = Seq(col("k"), col("n"))
    val tracked = PrefixSum.withRunningTotalsTracked(
      df, keys, Seq("v", "w"), Seq("cv", "cw"))
    val got = tracked.df.select("k", "n", "v", "w", "cv", "cw")
      .collect().map(_.toSeq).toSet
    val win = Window.orderBy(keys: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val want = df
      .withColumn("cv", sum(col("v")).over(win))
      .withColumn("cw", sum(col("w").cast("long")).over(win))
      .select("k", "n", "v", "w", "cv", "cw")
      .collect().map(_.toSeq).toSet
    assert(got === want)
    assert(tracked.totals === Seq(25L, 3L))
  }

  test("int value columns work; non-integral rejected") {
    val df = Seq((1, 10), (2, 20)).toDF("k", "v")
    val cum = PrefixSum.withRunningTotal(df, Seq(col("k")), "v", "cum")
      .orderBy("k").select("cum").as[Long].collect().toSeq
    assert(cum === Seq(10L, 30L))
    intercept[IllegalArgumentException] {
      PrefixSum.withRunningTotal(
        Seq((1, 1.0)).toDF("k", "v"), Seq(col("k")), "v", "cum")
    }
  }
}
