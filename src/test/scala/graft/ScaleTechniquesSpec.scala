package graft

import org.apache.spark.sql.functions._
import graft.operators.Salting
import graft.sources.Bucketing

/** The scale techniques that only show up in plans, asserted on plans:
  * bucketed co-located joins (no exchange, no sort) and salted skew
  * joins (identical semantics, spread hot keys). */
class ScaleTechniquesSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("bucketed fact-fact join plans with no Exchange and no Sort") {
    val li = Tables(spark, dir, "lineitem")
      .select("l_orderkey", "l_extendedprice")
    val ord = Tables(spark, dir, "orders")
      .select("o_orderkey", "o_orderdate")
    Bucketing.writeBucketed(li, "li_bucketed", "l_orderkey", 8)
    Bucketing.writeBucketed(ord, "ord_bucketed", "o_orderkey", 8)

    // broadcast would bypass the bucketing path; force SMJ for the check
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val joined = Bucketing.colocatedJoin(spark,
        "li_bucketed", "ord_bucketed", "l_orderkey", "o_orderkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"))
      assert(!plan.contains("Exchange"), s"bucketed join shuffled:\n$plan")
      // rows match the plain join
      val expected = Tables(spark, dir, "lineitem")
        .join(Tables(spark, dir, "orders"),
          col("l_orderkey") === col("o_orderkey")).count()
      assert(joined.count() === expected)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10MB")
      spark.conf.set("spark.sql.adaptive.enabled", "true")
      spark.sql("DROP TABLE IF EXISTS li_bucketed")
      spark.sql("DROP TABLE IF EXISTS ord_bucketed")
    }
  }

  test("colocatedJoin refuses unbucketed or mismatched tables") {
    Tables(spark, dir, "region").write.mode("overwrite")
      .saveAsTable("region_plain")
    try {
      intercept[RuntimeException] {
        Bucketing.colocatedJoin(spark, "region_plain", "region_plain",
          "r_regionkey", "r_regionkey")
      }
    } finally spark.sql("DROP TABLE IF EXISTS region_plain")
  }

  test("salted join == plain join on a skewed dataset") {
    // 10k rows, 90% on one hot key — the shape that stalls one task
    val fact = spark.range(10000)
      .select((when(col("id") % 10 =!= 0, lit(42L)).otherwise(col("id")))
        .as("k"), col("id").as("payload"))
    val dim = Seq((42L, "hot"), (0L, "cold"), (10L, "cold"), (20L, "cold"))
      .toDF("dk", "label")

    val plain = fact.join(dim, col("k") === col("dk"))
      .select("k", "payload", "label")
    val salted = Salting.saltedJoin(fact, dim, "k", "dk", salts = 8)
      .select("k", "payload", "label")

    val a = plain.collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getString(2))).sorted
    val b = salted.collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getString(2))).sorted
    assert(a.length > 8000) // the hot key really is hot
    assert(a.toSeq === b.toSeq)
  }

  test("salted left join keeps unmatched fact rows exactly once") {
    val fact = spark.range(100).select(col("id").as("k"))
    val dim = Seq((1L, "x")).toDF("dk", "label")
    val out = Salting.saltedJoin(fact, dim, "k", "dk", salts = 4, "left")
    assert(out.count() === 100)
    assert(out.filter(col("label").isNotNull).count() === 1)
  }
}
