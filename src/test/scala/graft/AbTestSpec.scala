package graft

import graft.operators.AbTest
import org.apache.spark.sql.functions.col

/** Experiment analysis: the chi-square / Welch / Mann-Whitney outputs
  * are checked against an independent driver-side re-computation from
  * the same per-user table (different code path: Scala doubles over
  * collected rows vs distributed integer sufficient stats). */
class AbTestSpec extends SparkSpec {
  import spark.implicits._

  private def syntheticEvents = {
    // 40 users × deterministic event mix: user u makes (u % 5) + 11
    // purchases of value (u % 7 + 1) · 1.25 plus some noise events
    val rows = (0L until 40L).flatMap { u =>
      val purchases = (u % 5 + 11).toInt
      val clicks = (u % 3 + 1).toInt
      Seq.fill(purchases)((u, "purchase", (u % 7 + 1) * 1.25)) ++
        Seq.fill(clicks)((u, "click", 0.5))
    }
    rows.toDF("user_id", "event_type", "value")
  }

  test("chi-square and Welch match a driver-side recomputation") {
    val ev = syntheticEvents
    val pu = AbTest.perUserArm(ev)
      .select("arm", "purchases", "cents")
      .as[(Long, Long, Long)].collect()
    val t = pu.filter(_._1 == 1); val c = pu.filter(_._1 == 0)
    val (nT, nC) = (t.length.toLong, c.length.toLong)
    val xT = t.count(_._2 >= AbTest.convMin).toLong
    val xC = c.count(_._2 >= AbTest.convMin).toLong
    val (sT, sC) = (t.map(_._3).sum, c.map(_._3).sum)
    val (qT, qC) = (t.map(r => r._3.toDouble * r._3).sum,
      c.map(r => r._3.toDouble * r._3).sum)
    val chi2 = 1e6 * (nT + nC) *
      math.pow((xT * (nC - xC) - (nT - xT) * xC).toDouble, 2) /
      (nT.toDouble * nC * (xT + xC) * ((nT - xT) + (nC - xC)))
    val vT = (nT * qT - sT.toDouble * sT) / (nT.toDouble * nT * (nT - 1))
    val vC = (nC * qC - sC.toDouble * sC) / (nC.toDouble * nC * (nC - 1))
    val welch = 1e6 * (sT.toDouble / nT - sC.toDouble / nC) /
      math.sqrt(vT + vC)

    val out = AbTest.abTest(ev).collect()
      .map(r => r.getString(0) -> r).toMap
    val conv = out("conversion"); val spend = out("spend")
    assert(conv.getLong(conv.fieldIndex("n_t")) === nT)
    assert(conv.getLong(conv.fieldIndex("n_c")) === nC)
    // same formula, different path — allow the 1-unit double-rounding slack
    assert(math.abs(conv.getLong(conv.fieldIndex("stat_micro"))
      - math.round(chi2)) <= 1)
    assert(math.abs(spend.getLong(spend.fieldIndex("stat_micro"))
      - math.round(welch)) <= 1)
    assert(conv.getBoolean(conv.fieldIndex("significant")) ===
      (conv.getLong(conv.fieldIndex("stat_micro")) >= AbTest.chi2CritMicro))
    assert(spend.getBoolean(spend.fieldIndex("significant")) ===
      (math.abs(spend.getLong(spend.fieldIndex("stat_micro")))
        >= AbTest.zCritMicro))
  }

  test("Mann-Whitney doubled rank sums match a driver-side ranking") {
    val ev = syntheticEvents
    val pu = AbTest.perUserArm(ev)
      .select("arm", "cents").as[(Long, Long)].collect()
    // average-rank assignment over the sorted spend values, doubled
    val sorted = pu.sortBy(_._2)
    val rank2 = sorted.zipWithIndex.groupBy(_._1._2).map {
      case (v, grp) =>
        val idxs = grp.map(_._2)
        v -> (idxs.min + idxs.max + 2).toLong // 2·avg(1-based ranks)
    }
    val r2T = sorted.filter(_._1 == 1).map(r => rank2(r._2)).sum
    val nT = pu.count(_._1 == 1).toLong
    val u2T = r2T - nT * (nT + 1)

    val row = AbTest.mannWhitney(ev).head
    assert(row.getLong(row.fieldIndex("n_t")) === nT)
    assert(row.getLong(row.fieldIndex("u2_t")) === u2T)
  }

  test("no-effect null: identical arms give zero effect and no flag") {
    // users 2u and 2u+1 mirror each other across arms only by hash —
    // instead force a constant metric: every user behaves identically,
    // so effect and z must be exactly 0 and nothing is significant
    val ev = (0L until 30L).flatMap(u =>
      Seq.fill(12)((u, "purchase", 2.0))).toDF(
      "user_id", "event_type", "value")
    val out = AbTest.abTest(ev).collect()
    out.foreach { r =>
      assert(r.getLong(r.fieldIndex("effect_micro")) === 0L)
      assert(!r.getBoolean(r.fieldIndex("significant")))
    }
    val mw = AbTest.mannWhitney(ev).head
    assert(mw.getLong(mw.fieldIndex("z_micro")) === 0L)
  }

  test("corpus: deterministic across runs") {
    val dir = "/root/testdata/sf0.001"
    val a = AbTest.qAbTest(spark, dir).orderBy(col("metric"))
      .collect().toSeq
    val b = AbTest.qAbTest(spark, dir).orderBy(col("metric"))
      .collect().toSeq
    assert(a === b)
    val m1 = AbTest.qMannWhitney(spark, dir).collect().toSeq
    val m2 = AbTest.qMannWhitney(spark, dir).collect().toSeq
    assert(m1 === m2)
  }
}
