package graft

import org.apache.spark.sql.functions._
import graft.operators.RecordLinkage

/** Fellegi–Sunter linkage: integer score chain replayed driver-side
  * from independently recomputed weights, decision-rule structure, and
  * the eval row's blocking/precision/recall accounting on sf0.001. */
class RecordLinkageSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  test("pair scores are exactly γ·wa + (1−γ)·wd under driver-replayed " +
    "FS weights from clean-side frequencies") {
    val clean = RecordLinkage.cleanSide(Tables(spark, dir, "customer"))
    // independent u estimate: Σcnt²/n² per field, same double shapes
    val rows = clean.collect()
    val n = rows.length.toDouble
    def u(f: String): Double = {
      val cnts = rows.groupBy(_.getAs[Any](f)).view.mapValues(_.length)
      cnts.values.map(c => c.toDouble * c).sum / (n * n)
    }
    def w(m: Double, md: Double, f: String): (Long, Long) =
      (math.round(1e6 * math.log(m / u(f))),
        math.round(1e6 * math.log(md / (1.0 - u(f)))))
    val (waN, wdN) = w(0.85, 0.15, "name")
    val (waT, wdT) = w(0.90, 0.10, "nation")
    val (waS, wdS) = w(0.90, 0.10, "seg")
    val (waB, wdB) = w(0.80, 0.20, "bal")
    val pairs = RecordLinkage.qRecordLinkage(spark, dir).collect()
    assert(pairs.nonEmpty)
    pairs.foreach { r =>
      def g(c: String): Long = r.getAs[Int](c).toLong
      val want = g("g_name") * waN + (1 - g("g_name")) * wdN +
        g("g_nation") * waT + (1 - g("g_nation")) * wdT +
        g("g_seg") * waS + (1 - g("g_seg")) * wdS +
        g("g_bal") * waB + (1 - g("g_bal")) * wdB
      assert(r.getAs[Long]("score_micro") === want)
      // decision is the pure three-way threshold rule on the score
      val want2 =
        if (want >= RecordLinkage.upperMicro) "match"
        else if (want < 0L) "non_match" else "possible"
      assert(r.getAs[String]("decision") === want2)
    }
    // name agreement implies identity (clean names unique; corrupted
    // names end 'X' and can't equal any clean name)
    pairs.filter(_.getAs[Int]("g_name") == 1)
      .foreach(r => assert(r.getAs[Int]("is_true") === 1))
  }

  test("eval row: blocking recall is high, decisions are consistent, " +
    "and every count reconciles with the pair table") {
    val ev = RecordLinkage.qLinkageEval(spark, dir).collect().head
    val pairs = RecordLinkage.qRecordLinkage(spark, dir)
    val n = Tables(spark, dir, "customer").count()
    assert(ev.getAs[Long]("n_records") === n)
    assert(ev.getAs[Long]("n_pairs") === pairs.count())
    assert(ev.getAs[Long]("blocking_found") ===
      pairs.filter(col("is_true") === 1).count())
    assert(ev.getAs[Long]("tp") <= ev.getAs[Long]("n_matches"))
    // union blocking only loses records with name AND region noise
    // (~3% expected); demand a conservative 90% floor
    assert(ev.getAs[Long]("blocking_recall_micro") > 900000L)
    assert(ev.getAs[Long]("recall_micro") <=
      ev.getAs[Long]("blocking_recall_micro"))
  }
}
