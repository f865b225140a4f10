package graft

import graft.operators.FuzzyJoin

/** PassJoin segment-signature fuzzy join: completeness + exactness vs a
  * driver-side brute force, and the no-cross-join plan claim. */
class FuzzyJoinSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def lev(a: String, b: String): Int = {
    val dp = Array.tabulate(b.length + 1)(identity)
    for (i <- 1 to a.length) {
      var prev = dp(0); dp(0) = i
      for (j <- 1 to b.length) {
        val cur = dp(j)
        dp(j) = math.min(math.min(dp(j) + 1, dp(j - 1) + 1),
          prev + (if (a(i - 1) == b(j - 1)) 0 else 1))
        prev = cur
      }
    }
    dp(b.length)
  }

  test("fuzzy join equals brute force (complete AND exact)") {
    val parts = Tables(spark, dir, "part")
      .select("p_partkey", "p_name").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    val want = (for {
      (k1, n1) <- parts; (k2, n2) <- parts
      if k1 < k2 && math.abs(n1.length - n2.length) <= FuzzyJoin.fuzzyD
      d = lev(n1, n2) if d <= FuzzyJoin.fuzzyD
    } yield (k1, k2, d)).toSet
    val got = FuzzyJoin.qFuzzyJoin(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(4))).toSet
    assert(got === want)
    assert(got.nonEmpty)
  }

  test("plan is an equi-join on signatures — no cross join") {
    val plan = FuzzyJoin.qFuzzyJoin(spark, dir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"expected equi-join only:\n$plan")
  }
}
