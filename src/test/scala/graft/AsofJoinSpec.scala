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

  test("asof: payload-less right side degenerates to the left unchanged") {
    val l = Seq((1L, 10L, "x"), (2L, 5L, "y")).toDF("k", "t", "lv")
    val r = Seq((1L, 8L), (2L, 9L)).toDF("k", "t")
    val out = AsofJoin.asofJoin(l, r, "k", "t")
    assert(out.columns.toSeq === l.columns.toSeq)
    assert(out.collect().map(_.toSeq).toSet === l.collect().map(_.toSeq).toSet)
  }

  test("asof: null right payload values are NOT backfilled from older rows") {
    val left = Seq((1L, 30L, "l")).toDF("k", "t", "lv")
    val right = Seq(
      (1L, 10L, Option("old"), Option(100L)),
      (1L, 20L, Option.empty[String], Option(200L))
    ).toDF("k", "t", "ra", "rb")
    val out = AsofJoin.asofJoin(left, right, "k", "t").collect().head
    // the t=20 row is the match; all payload comes from IT — its null ra
    // must not be stitched together with t=10's "old"
    assert(out.getAs[Long]("rb") === 200L)
    assert(out.getAs[String]("ra") == null)
  }

  test("asof == brute-force reference on random data (property)") {
    import org.scalacheck.Gen
    val genRows = for {
      nl <- Gen.chooseNum(0, 30)
      nr <- Gen.chooseNum(0, 30)
      lrows <- Gen.listOfN(nl, Gen.zip(Gen.chooseNum(1L, 4L), Gen.chooseNum(0L, 50L)))
      rrows <- Gen.listOfN(nr, Gen.zip(Gen.chooseNum(1L, 4L), Gen.chooseNum(0L, 50L)))
    } yield (lrows, rrows)
    forAllSamples(genRows, n = 15) { case (lrows, rrows) =>
      // dedupe right on (k, t): the operator is deterministic only when
      // the right side has one payload per (key, time) — same contract
      // the driver query satisfies
      val rclean = rrows.distinctBy(x => (x._1, x._2))
      val left = lrows.zipWithIndex
        .map { case ((k, t), i) => (k, t, s"l$i") }.toDF("k", "t", "lv")
      val right = rclean.map { case (k, t) => (k, t, s"r$k-$t") }
        .toDF("k", "t", "rv")
      val got = AsofJoin.asofJoin(left, right, "k", "t")
        .select("k", "t", "lv", "rv").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
          Option(r.getString(3)).orNull)).toSet
      val want = lrows.zipWithIndex.map { case ((k, t), i) =>
        val best = rclean.filter(r => r._1 == k && r._2 <= t)
          .sortBy(_._2).lastOption
        (k, t, s"l$i", best.map(r => s"r${r._1}-${r._2}").orNull)
      }.toSet
      assert(got === want)
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
