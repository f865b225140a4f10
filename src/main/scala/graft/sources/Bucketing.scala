package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed tables — the storage-level answer to repeated fact-fact
  * joins (SURVEY §4's J6 is the in-engine case: two facts joined on a
  * key, too big to broadcast).
  *
  * A join between two tables bucketed AND sorted on the join key with
  * the same bucket count needs NO exchange and NO sort: each task zips
  * bucket i of both sides (plan-asserted in ScaleTechniquesSpec). At
  * 100 TB that converts the dominant shuffle of every repeated join
  * into a one-time cost paid at write time — the right trade whenever a
  * fact is joined more often than it is rewritten.
  *
  * Spark's bucketing lives in the catalog (`saveAsTable`); bucket files
  * are hash-split by key, so each bucket is also the unit of join-side
  * skew: size `buckets` so the hottest key's bucket still fits an
  * executor (hot SINGLE keys need [[graft.operators.Salting]] instead).
  */
object Bucketing {

  /** Write `df` as a managed parquet table bucketed + sorted on `key`. */
  def writeBucketed(df: DataFrame, table: String, key: String,
                    buckets: Int): Unit =
    df.write.mode("overwrite").format("parquet")
      .bucketBy(buckets, key).sortBy(key)
      .saveAsTable(table)

  /** The co-located join: both sides must be bucketed on their join key
    * with the same bucket count (enforced here, not silently assumed). */
  def colocatedJoin(spark: SparkSession, leftTable: String,
                    rightTable: String, leftKey: String,
                    rightKey: String): DataFrame = {
    def bucketSpec(t: String) = {
      val c = spark.sessionState.catalog
        .getTableMetadata(org.apache.spark.sql.catalyst.TableIdentifier(t))
      c.bucketSpec.getOrElse(
        sys.error(s"$t is not bucketed — colocatedJoin would shuffle"))
    }
    val (lb, rb) = (bucketSpec(leftTable), bucketSpec(rightTable))
    require(lb.numBuckets == rb.numBuckets,
      s"bucket counts differ (${lb.numBuckets} vs ${rb.numBuckets}) — " +
        "the join would re-shuffle one side")
    spark.table(leftTable).join(spark.table(rightTable),
      spark.table(leftTable)(leftKey) === spark.table(rightTable)(rightKey))
  }
}
