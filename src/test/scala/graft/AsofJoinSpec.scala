package graft

import org.apache.spark.sql.functions._
import graft.operators.AsofJoin

/** As-of join semantics on handcrafted data: most-recent-prior match,
  * inclusive ties, null when nothing precedes, per-key isolation. */
class AsofJoinSpec extends SparkSpec {
  import spark.implicits._

  test("asof: most recent prior right row, inclusive at equal time") {
    val left = Seq(
      (1L, 10L, "l1"), (1L, 20L, "l2"), (1L, 5L, "l0"),
      (2L, 10L, "m1")
    ).toDF("k", "t", "lv")
    val right = Seq(
      (1L, 8L, "r8"), (1L, 20L, "r20"), (1L, 25L, "r25"),
      (2L, 11L, "s11")
    ).toDF("k", "t", "rv")

    val out = AsofJoin.asofJoin(left, right, "k", "t")
      .select("k", "t", "lv", "rv").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        Option(r.getString(3)).orNull)).toSet

    assert(out === Set(
      (1L, 5L, "l0", null),   // nothing at or before t=5
      (1L, 10L, "l1", "r8"),  // r8 is the latest <= 10
      (1L, 20L, "l2", "r20"), // inclusive: the t=20 right row wins
      (2L, 10L, "m1", null))) // key 2's right row is later; key 1's rows invisible
  }

  test("asof: rejects overlapping payload column names") {
    val l = Seq((1L, 1L, "x")).toDF("k", "t", "v")
    val r = Seq((1L, 1L, "y")).toDF("k", "t", "v")
    intercept[IllegalArgumentException] {
      AsofJoin.asofJoin(l, r, "k", "t")
    }
  }

  test("asof driver query: every click row present, matches forward-fill invariant") {
    val dir = "/root/testdata/sf0.001"
    val ev = Tables(spark, dir, "events")
    val nClicks = ev.filter(col("event_type") === "click").count()
    val out = AsofJoin.qAsofJoin(spark, dir)
    assert(out.count() === nClicks)
    // any matched view_value must belong to a view event of the same
    // user at or before the click's ts
    val views = ev.filter(col("event_type") === "view")
      .select(col("user_id").as("vu"), col("ts").as("vts"),
        col("value").as("vv"))
    val bad = out.filter(col("view_value").isNotNull)
      .join(views, col("user_id") === col("vu") &&
        col("view_value") === col("vv") && col("vts") <= col("ts"),
        "left_anti")
    assert(bad.count() === 0)
  }
}
