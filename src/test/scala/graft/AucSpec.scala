package graft

import graft.operators.Auc

/** AUC: the rank-sum formulation must equal the probabilistic
  * definition P(s+ > s-) + 0.5·P(s+ = s-) brute-forced over all
  * pos/neg pairs, and hit the exact boundary values. */
class AucSpec extends SparkSpec {
  import spark.implicits._

  private def bruteAuc(rows: Seq[(Long, Int)]): Double = {
    val pos = rows.filter(_._2 == 1).map(_._1)
    val neg = rows.filter(_._2 == 0).map(_._1)
    val wins = (for (p <- pos; n <- neg) yield
      if (p > n) 1.0 else if (p == n) 0.5 else 0.0).sum
    wins / (pos.length.toDouble * neg.length)
  }

  test("matches the all-pairs probabilistic definition with ties") {
    val rows = Seq[(Long, Int)](
      (5L, 1), (5L, 0), (3L, 1), (3L, 1), (3L, 0), (1L, 0),
      (7L, 1), (0L, 0), (5L, 1), (2L, 0), (2L, 1), (9L, 0))
    val out = Auc.auc(rows.toDF("score", "y").repartition(3)).collect().head
    assert(out.getLong(out.fieldIndex("n_pos")) === 6L)
    assert(out.getLong(out.fieldIndex("n_neg")) === 6L)
    assert(out.getLong(out.fieldIndex("auc_micro")) ===
      math.round(1e6 * bruteAuc(rows)))
    assert(out.getLong(out.fieldIndex("gini_micro")) ===
      math.round(1e6 * (2.0 * bruteAuc(rows) - 1.0)))
    assert(out.getBoolean(out.fieldIndex("defined")))
  }

  test("perfect separation = 1.0; full ties = 0.5; single class abstains") {
    val perfect = Seq[(Long, Int)]((10L, 1), (9L, 1), (2L, 0), (1L, 0))
    val p = Auc.auc(perfect.toDF("score", "y")).collect().head
    assert(p.getLong(p.fieldIndex("auc_micro")) === 1000000L)
    assert(p.getLong(p.fieldIndex("gini_micro")) === 1000000L)

    val tied = Seq[(Long, Int)]((4L, 1), (4L, 0), (4L, 1), (4L, 0))
    val t = Auc.auc(tied.toDF("score", "y")).collect().head
    assert(t.getLong(t.fieldIndex("auc_micro")) === 500000L)
    assert(t.getLong(t.fieldIndex("gini_micro")) === 0L)

    val single = Seq[(Long, Int)]((4L, 1), (5L, 1))
    val s = Auc.auc(single.toDF("score", "y")).collect().head
    assert(s.getLong(s.fieldIndex("auc_micro")) === 500000L)
    assert(!s.getBoolean(s.fieldIndex("defined")))
  }
}
