package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import graft.ext.SoftDedup
import graft.operators.Aggregates

/** CUBE lattice and soft-dedup reweighting. */
class SoftDedupSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  test("cube: all four grouping levels in one pass; grand total row present") {
    val rows = Aggregates.qCube(spark, dir).collect()
    val levels = rows.map(r =>
      (r.getAs[Int]("g_rf"), r.getAs[Int]("g_ls"))).distinct.sorted
    assert(levels === Seq((0, 0), (0, 1), (1, 0), (1, 1)))
    val grand = rows.filter(r =>
      r.getAs[Int]("g_rf") == 1 && r.getAs[Int]("g_ls") == 1)
    assert(grand.length === 1)
    assert(grand(0).getAs[Long]("n_rows")
      === Tables(spark, dir, "lineitem").count())
  }

  test("soft dedup: cluster total weight is exactly one document") {
    val schema = StructType(Seq(StructField("doc_id", LongType, false),
      StructField("key", StringType, false),
      StructField("tokens", LongType, false)))
    val docs = spark.createDataFrame(spark.sparkContext.parallelize(Seq(
      Row(1L, "a", 10L), Row(2L, "a", 10L), Row(3L, "a", 10L),
      Row(4L, "b", 7L)), 2), schema)
    val out = SoftDedup.softWeights(docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(out(1L).getAs[Long]("weight_micro") === 333333L)
    assert(out(4L).getAs[Long]("weight_micro") === 1000000L)
    assert(out(1L).getAs[Long]("eff_tokens_micro") === 3333333L)
    assert(out(4L).getAs[Long]("eff_tokens_micro") === 7000000L)
    // per-cluster weight mass ≈ 1e6 (integer truncation only)
    val aMass = Seq(1L, 2L, 3L).map(out(_).getAs[Long]("weight_micro")).sum
    assert(aMass === 999999L)
  }

  test("source ablation: hand-computed LOO deltas; single-source guard") {
    import graft.ext.SourceAblation
    val schema = StructType(Seq(StructField("source", StringType, false),
      StructField("pass", LongType, false)))
    def flags(rows: Seq[(String, Long)]) =
      spark.createDataFrame(spark.sparkContext.parallelize(
        rows.map(r => Row(r._1, r._2)), 2), schema)
    // A passes 1/2, B passes 2/2: overall 3/4; without A = 1e6,
    // without B = 500000 -> deltas +250000 / -250000
    val out = SourceAblation.sourceAblation(flags(Seq(
        ("A", 1L), ("A", 0L), ("B", 1L), ("B", 1L))))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out("A").getAs[Long]("loo_rate_micro") === 1000000L)
    assert(out("A").getAs[Long]("delta_micro") === 250000L)
    assert(out("B").getAs[Long]("delta_micro") === -250000L)
    // a corpus that IS one source: guard, not a division by zero
    val solo = SourceAblation.sourceAblation(flags(Seq(("A", 1L))))
      .collect()(0)
    assert(!solo.getAs[Boolean]("ablatable"))
    assert(solo.getAs[Long]("loo_rate_micro") === 0L)
  }

  test("source ablation driver query: one row per source, rates in range") {
    val out = graft.ext.SourceAblation.qSourceAblation(spark, dir).collect()
    assert(out.nonEmpty)
    assert(out.forall { r =>
      val p = r.getAs[Long]("pass_rate_micro"); p >= 0L && p <= 1000000L })
    assert(out.forall(_.getAs[Boolean]("ablatable")))
  }

  test("soft dedup driver query: every document keeps a row; uniques weigh 1") {
    val out = SoftDedup.qSoftDedup(spark, dir).collect()
    assert(out.length === Tables(spark, dir, "documents").count())
    assert(out.filter(_.getAs[Long]("cluster_sz") == 1L)
      .forall(_.getAs[Long]("weight_micro") == 1000000L))
  }
}
