package graft

import graft.operators.IntervalJoin
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** Interval join: hand-built overlap cases (touching endpoints,
  * containment, disjoint, multi-bucket dedup), the banded plan vs the
  * inequality-join oracle on the corpus, and the no-cross-join plan. */
class IntervalJoinSpec extends SparkSpec {
  import spark.implicits._

  private def t(s: String) = Timestamp.valueOf(s)

  test("interval join: containment, partial overlap, touching, disjoint") {
    val left = Seq(
      (1L, t("2024-01-01 10:15:00"), t("2024-01-01 10:45:00")), // inside r1
      (2L, t("2024-01-01 09:30:00"), t("2024-01-01 10:30:00")), // spans into r1
      (3L, t("2024-01-01 12:00:00"), t("2024-01-01 13:00:00")), // disjoint
      (4L, t("2024-01-01 11:00:00"), t("2024-01-01 11:30:00"))) // touches r1 end
      .toDF("lid", "lstart", "lend")
    val right = Seq(
      (10L, t("2024-01-01 10:00:00"), t("2024-01-01 11:00:00")))
      .toDF("rid", "rstart", "rend")
    val got = IntervalJoin.intervalJoin(left, right)
      .select("lid").collect().map(_.getLong(0)).toSet
    // closed-interval semantics in the generic operator: 4 touches at 11:00
    assert(got === Set(1L, 2L, 4L))
  }

  test("interval join: pair sharing many buckets appears once") {
    val left = Seq(
      (1L, t("2024-01-01 00:00:00"), t("2024-01-01 23:00:00")))
      .toDF("lid", "lstart", "lend")
    val right = Seq(
      (10L, t("2024-01-01 05:00:00"), t("2024-01-01 20:00:00")))
      .toDF("rid", "rstart", "rend")
    assert(IntervalJoin.intervalJoin(left, right).count() === 1)
  }

  test("interval join: banded plan equals the inequality oracle on the corpus") {
    val dir = "/root/testdata/sf0.001"
    Tables.registerAll(spark, dir)
    val got = IntervalJoin.qIntervalJoin(spark, dir)
    // Spark replay of the DuckDB oracle: epoch_us → unix_micros
    val want = spark.sql(
      IntervalJoin.qIntervalJoinSql.replace("epoch_us", "unix_micros"))
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
    assert(got.count() > 0)
    // and the interval pairing is an equi-join on the band, not a
    // cross product (the 1-row stats broadcast legitimately plans as a
    // broadcast nested loop — that's the scalar crossJoin, not pairing)
    val plan = got.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan.take(800))
  }
}
