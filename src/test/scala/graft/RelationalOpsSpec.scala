package graft

import org.apache.spark.sql.functions._
import graft.operators.{Aggregates, ZOrder}

/** Round-10 relational additions: broadcast-chain plan for the Q5-shaped
  * rollup, winsorize band invariants, z-value bit arithmetic vs a plain
  * Scala reference. */
class RelationalOpsSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("region revenue: nation and region broadcast, facts shuffle") {
    val plan = Aggregates.qRegionRevenue(spark, dir)
      .queryExecution.executedPlan.toString
    val nBroadcast = "BroadcastHashJoin".r.findAllIn(plan).length
    assert(nBroadcast >= 2, s"expected ≥2 broadcast joins:\n$plan")
  }

  test("winsorize: clipped values inside the band, flags consistent") {
    val rows = Aggregates.qWinsorize(spark, dir).collect()
    assert(rows.nonEmpty)
    val byType = rows.groupBy(_.getString(1))
    byType.values.foreach { rs =>
      val clipped = rs.map(_.getDouble(3))
      val raw = rs.map(_.getDouble(2))
      // every clipped value within the observed clipped range; flags
      // match whether clipping changed the value
      rs.foreach { r =>
        assert((r.getDouble(2) != r.getDouble(3)) == (r.getInt(4) == 1))
      }
      assert(clipped.min >= raw.min && clipped.max <= raw.max)
    }
    // p1/p99 clipping on a non-degenerate column must clip SOMETHING
    assert(rows.exists(_.getInt(4) == 1))
  }

  test("zorder: engine z-values equal a bit-by-bit Scala reference") {
    def spread(x: Long): Long = {
      var v = x
      v = (v | (v << 8)) & 0x00FF00FFL
      v = (v | (v << 4)) & 0x0F0F0F0FL
      v = (v | (v << 2)) & 0x33333333L
      v = (v | (v << 1)) & 0x55555555L
      v
    }
    val rows = ZOrder.qZorder(spark, dir).limit(500).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val z = spread(r.getLong(2) % 65536) | (spread(r.getLong(3) % 65536) << 1)
      assert(r.getLong(4) === z)
      assert(r.getInt(5) === (z / 16777216L).toInt)
    }
    // interleave is a bijection pair-wise: distinct (part,supp) pairs
    // in the sample get distinct z-values
    val sample = rows.map(r => (r.getLong(2) % 65536, r.getLong(3) % 65536))
      .distinct
    assert(rows.map(_.getLong(4)).distinct.length === sample.length)
  }
}
