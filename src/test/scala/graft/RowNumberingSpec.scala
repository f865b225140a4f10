package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.operators.RowNumbering

/** W1 — the scalable global row-number must agree exactly with the
  * single-partition window it replaces. */
class RowNumberingSpec extends SparkSpec {
  import spark.implicits._

  test("matches ROW_NUMBER() OVER (ORDER BY ...) incl. ties broken by key") {
    val df = Seq(
      ("2020-01-02", "b", 1), ("2020-01-01", "c", 2), ("2020-01-01", "a", 3),
      ("2020-01-03", "x", 4), ("2020-01-01", "a", 1))
      .toDF("d", "k", "n").repartition(5) // scatter across partitions
    val keys = Seq(col("d"), col("k"), col("n"))

    val scalable = RowNumbering.withGlobalRowNumber(df, keys, "Id")
      .select("d", "k", "n", "Id").collect().map(_.toSeq).toSet
    val window = df.withColumn("Id",
      row_number().over(Window.orderBy(keys: _*)).cast("long"))
      .select("d", "k", "n", "Id").collect().map(_.toSeq).toSet
    assert(scalable === window)
  }

  test("ids are contiguous 1..N") {
    val df = (1 to 1000).map(i => (i % 97, i)).toDF("a", "b").repartition(7)
    val ids = RowNumbering.withGlobalRowNumber(
      df, Seq(col("a"), col("b")), "Id").select("Id").as[Long].collect().sorted
    assert(ids.toSeq === (1L to 1000L))
  }
}
