package graft

import org.apache.spark.sql.functions._
import graft.operators.JoinAdvisor

/** Join advisor: the estimated cardinality IS the exact join output
  * size (checked by running the join), the skew share matches the
  * planted hot key, and the strategy thresholds fire as documented. */
class JoinAdvisorSpec extends SparkSpec {
  import spark.implicits._

  test("est_rows equals the materialized join size; planted skew flagged") {
    val a = ((1L to 1000L).map(i => (i % 20, i)) ++
      (1L to 400L).map(i => (99L, i))).toDF("ak", "v")
    val b = ((1L to 200L).map(i => (i % 20, i)) ++
      Seq((99L, 0L), (99L, 1L))).toDF("bk", "w")
    val advice = JoinAdvisor.advise(a, "ak", b, "bk", "t").head()
    val actual = a.join(b, col("ak") === col("bk")).count()
    assert(advice.getLong(1) === actual)
    // hot key 99: 400×2 = 800 output rows — dominates the product
    assert(advice.getLong(3) === 800L)
    assert(math.abs(advice.getDouble(4) - 800.0 / actual) < 1e-15)
  }

  test("strategy thresholds: broadcast, then salt, then shuffle") {
    val smallDim = (1L to 10L).map(i => (i, i)).toDF("bk", "w")
    val bigUniform = (1L to 300000L).map(i => (i % 1000, i)).toDF("bk", "w")
    val fact = (1L to 2000L).map(i => (i % 1000, i)).toDF("ak", "v")
    val hotFact = ((1L to 2000L).map(i => (i % 1000, i)) ++
      (1L to 5000L).map(i => (7L, i))).toDF("ak", "v")
    // small build side → broadcast regardless of skew
    assert(JoinAdvisor.advise(hotFact, "ak", smallDim, "bk", "x")
      .head().getString(6) === "broadcast")
    // big build side + hot key owning >20% of output → salt
    assert(JoinAdvisor.advise(hotFact, "ak", bigUniform, "bk", "y")
      .head().getString(6) === "salt")
    // big build side, uniform → shuffle
    assert(JoinAdvisor.advise(fact, "ak", bigUniform, "bk", "z")
      .head().getString(6) === "shuffle")
  }

  test("driver query: three joins, sane strategies on testdata") {
    val out = JoinAdvisor.qJoinAdvisor(spark, "/root/testdata/sf0.001")
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out.size === 3)
    // dims fit the broadcast budget at this SF
    assert(out("lineitem_orders").getString(6) === "broadcast")
    assert(out("lineitem_part").getString(6) === "broadcast")
    // every est is consistent: est_rows ≥ max_key_rows ≥ 1
    out.values.foreach { r =>
      assert(r.getLong(1) >= r.getLong(3) && r.getLong(3) >= 1L)
      assert(r.getDouble(4) > 0.0 && r.getDouble(4) <= 1.0)
    }
  }
}
