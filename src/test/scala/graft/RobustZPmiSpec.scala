package graft

import graft.ext.Collocations
import graft.operators.Events
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** Robust z (MAD breakdown resistance) and PMI collocations (bound
  * pairs outrank frequent-but-independent pairs). */
class RobustZPmiSpec extends SparkSpec {
  import spark.implicits._

  test("robust z: a single extreme hour is flagged and does NOT poison the scale") {
    // 30 dense hours at 10 events, one hour at 200: classic mean/σ
    // z-score of the spike ≈ 5.3 but σ is inflated 6×; median/MAD sees
    // med=10, mad=0 → the spike is infinitely out; quiet hours z=0
    val rows = (0 until 30).flatMap { h =>
      val n = if (h == 15) 200 else 10
      val day = 1 + h / 24 // consecutive hours across two calendar days
      (0 until n).map(_ =>
        (1L, f"2024-01-0$day%d ${h % 24}%02d:15:00", "x"))
    }
    val ev = rows.zipWithIndex.map { case ((u, t, ty), i) =>
      (u, i.toLong, Timestamp.valueOf(t), ty, 1.0, "{}")
    }.toDF("user_id", "event_id", "ts", "event_type", "value", "props")
    val out = Events.robustZ(ev).collect()
    val flagged = out.filter(_.getInt(6) == 1)
    assert(flagged.length === 1)
    assert(flagged.head.getLong(2) === 200L)
    // median untouched by the outlier
    assert(out.head.getDouble(3) === 10.0)
  }

  test("pmi: a bound pair outranks a frequent-but-independent pair") {
    // "los angeles" always together (10×); "the" everywhere (40×) so
    // "the thing"-style pairs are frequent but unsurprising
    val docs = (1 to 10).map(i =>
      (i.toLong, "the cat saw the dog near los angeles today"))
      .toDF("doc_id", "text")
    val out = Collocations.pmi(docs, minCount = 5).collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getDouble(3))).toMap
    assert(out.contains(("los", "angeles")))
    // every pair involving "the" scores strictly lower than the bound pair
    val boundPmi = out(("los", "angeles"))
    out.filter { case ((a, b), _) => a == "the" || b == "the" }
      .values.foreach(v => assert(v < boundPmi))
  }

  test("both: corpus plans equal their SQL replays") {
    val dir = "/root/testdata/sf0.001"
    Tables.registerAll(spark, dir)
    val rz = Events.qRobustZ(spark, dir)
    val rzSql = spark.sql(Events.qRobustZSql
      .replace("unnest(generate_series(h0, h1, INTERVAL 1 HOUR))",
        "explode(sequence(h0, h1, INTERVAL 1 HOUR))")
      .replace("quantile_cont(n, 0.5)", "percentile(n, 0.5)")
      .replace("quantile_cont(abs(d.n - m.med), 0.5)",
        "percentile(abs(d.n - m.med), 0.5)"))
    assert(rz.exceptAll(rzSql).isEmpty && rzSql.exceptAll(rz).isEmpty)
    assert(rz.count() > 0)
  }
}
