package graft

import org.apache.spark.sql.DataFrame
import graft.views.Views

/** S6 cross-check: the views created FROM SQL TEXT (`Views.createAll`,
  * the reference's `CREATE OR REPLACE VIEW` surface, `config.py:215-221`)
  * must return exactly the rows of the DataFrame builders. Proves the
  * engine's SQL surface, not just the DataFrame one (SURVEY §7.1(5)).
  */
class ViewsSqlSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  private def assertSameRows(sql: DataFrame, df: DataFrame): Unit = {
    assert(sql.columns.toSeq === df.columns.toSeq)
    assert(sql.count() === df.count())
    assert(sql.exceptAll(df).isEmpty && df.exceptAll(sql).isEmpty)
  }

  test("S6: SQL views == DataFrame builders for all three views") {
    Views.createAll(spark, dir)
    assertSameRows(spark.table("TRANSACTIONS"), Views.transactions(spark, dir))
    assertSameRows(spark.table("RETENTION"), Views.retention(spark, dir))
    assertSameRows(spark.table("AUTO_OPTIOM"), Views.autoOptiom(spark, dir))
  }

  test("TRANSACTIONS_SCALED: same rows as the verbatim view, distributed plan") {
    Views.createAll(spark, dir)
    val verbatim = spark.table("TRANSACTIONS")
    val scaled = spark.table("TRANSACTIONS_SCALED")
    assert(scaled.columns.toSeq === verbatim.columns.toSeq)
    // Id casts to long: the verbatim ROW_NUMBER yields int, the scaled
    // rn + bigint offset yields long — values identical
    import org.apache.spark.sql.functions.col
    def normalized(df: DataFrame) =
      df.withColumn("Id", col("Id").cast("long"))
        .withColumn("MinId", col("MinId").cast("long"))
    assert(normalized(scaled).exceptAll(normalized(verbatim)).isEmpty &&
      normalized(verbatim).exceptAll(normalized(scaled)).isEmpty)
    // the verbatim plan carries the known single-partition window; the
    // scaled plan must not have a SinglePartition exchange ANYWHERE —
    // its windows are bucket-/key-partitioned and the bucket offsets
    // come from an aggregate self-join, not a global window
    assert(verbatim.queryExecution.executedPlan.toString
      .contains("SinglePartition"))
    assert(!scaled.queryExecution.executedPlan.toString
      .contains("SinglePartition"))
  }

  test("S6: views are lazy — re-creation replaces, table() re-evaluates") {
    Views.createAll(spark, dir)
    val n1 = spark.table("TRANSACTIONS").count()
    Views.createAll(spark, dir) // CREATE OR REPLACE is idempotent
    assert(spark.table("TRANSACTIONS").count() === n1)
  }
}
