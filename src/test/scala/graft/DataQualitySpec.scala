package graft

import org.apache.spark.sql.functions._
import graft.operators.DataQuality

/** Data-quality family: profile invariants cross-checked against
  * direct aggregation, rule counts recomputed independently, Benford
  * shares summing to their contracts, and the skew profile's HHI
  * bounds. */
class DataQualitySpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("profile: per-column stats match directly-computed values") {
    val out = DataQuality.qDqProfile(spark, dir).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(out.size === 6)
    val o = Tables(spark, dir, "orders")
    val n = o.count()
    assert(out.values.forall(_.getLong(1) === n))
    // cross-check one numeric and one string column end-to-end
    val okRow = out("o_orderkey")
    assert(okRow.getLong(2) === o.filter(col("o_orderkey").isNull).count())
    assert(okRow.getLong(3) ===
      o.select(countDistinct(col("o_orderkey"))).head().getLong(0))
    assert(okRow.getDouble(4) ===
      o.agg(min(col("o_orderkey"))).head().getLong(0).toDouble)
    val stRow = out("o_orderstatus")
    assert(stRow.isNullAt(4) && stRow.isNullAt(5)) // no numeric axis
    assert(stRow.getString(6) ===
      o.agg(min(col("o_orderstatus"))).head().getString(0))
    // distinct never exceeds non-null rows
    assert(out.values.forall(r => r.getLong(3) <= r.getLong(1) - r.getLong(2)))
  }

  test("rules: checked totals and one independently recomputed count") {
    val out = DataQuality.qDqRules(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out.size === 7)
    val li = Tables(spark, dir, "lineitem")
    val nLi = li.count()
    assert(out("l_quantity_in_1_50")._1 === nLi)
    assert(out("l_returnflag_domain")._2 ===
      li.filter(!col("l_returnflag").isin("A", "N", "R") ||
        col("l_returnflag").isNull).count())
    // violations bounded by checked
    assert(out.values.forall { case (c, v) => v >= 0 && v <= c })
  }

  test("benford: observed shares sum to 1, expectations sum to 1, g finite") {
    val rows = DataQuality.qBenford(spark, dir).collect()
    assert(rows.nonEmpty && rows.length <= 9)
    val n = rows.head.getLong(2)
    assert(rows.map(_.getLong(1)).sum === n)
    // full Benford support sums to 1; observed digits may be a subset
    val expFull = (1 to 9).map(d => math.log((d + 1.0) / d) / math.log(10.0)).sum
    assert(math.abs(expFull - 1.0) < 1e-12)
    val g = rows.head.getDouble(5)
    assert(!g.isNaN && !g.isInfinite && g >= 0.0)
    assert(rows.forall(_.getDouble(5) === g)) // corpus stat, same every row
  }

  test("scan pruning: benford's scan reads ONLY o_totalprice") {
    val plan = DataQuality.qBenford(spark, dir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("ReadSchema: struct<o_totalprice:double>"),
      plan.linesIterator.filter(_.contains("ReadSchema")).mkString("\n"))
  }

  test("skew profile: HHI and top-share bounds hold per key") {
    val rows = DataQuality.qSkewProfile(spark, dir).collect()
    assert(rows.length === 4)
    rows.foreach { r =>
      val (nKeys, nRows, maxC) = (r.getLong(1), r.getLong(2), r.getLong(3))
      val (top1, hhi) = (r.getDouble(4), r.getDouble(5))
      assert(maxC >= nRows / nKeys) // max ≥ mean
      assert(top1 >= 1.0 / nKeys.toDouble && top1 <= 1.0)
      // HHI between uniform floor and 1, and ≥ top1²
      assert(hhi >= (1.0 / nKeys.toDouble) - 1e-12 && hhi <= 1.0)
      assert(hhi >= top1 * top1 / 1.0000001)
    }
  }
}
