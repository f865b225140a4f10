package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types.StructType
import graft.operators.{AbTest, KaplanMeier, LogRank, Rmst}

/** Incrementally-maintained SURVIVAL CLOCKS — the streaming half of
  * the survival family ([[KaplanMeier]], [[LogRank]], [[Rmst]]): event
  * batches arrive, and the store keeps exactly the per-user state
  * every survival readout derives from —
  *
  *   first event timestamp (lattice MIN), last event timestamp
  *   (lattice MAX), first big-ticket purchase timestamp (lattice MIN
  *   over a filtered column)
  *
  * — all idempotent lattice monoids riding [[MonoidStore.aggReduce]]'s
  * min/max columns, so the served clocks equal the batch scan's at
  * every point: a user's censoring time EXTENDS as later batches
  * arrive (l_us max), their event time can only move EARLIER (p_us
  * min over what's been observed), and the duration/censoring verdict
  * is re-derived in the view rather than frozen at ingest — exactly
  * the semantics [[LogRank]]'s scaladoc promises the store.
  *
  * At 100 TB the store is |users|-bounded, a batch's delta is its own
  * per-user agg, and each view's work is the calendar-bounded grid. */
object SurvivalStore {

  /** One batch's per-user clock delta. `p_us` is null until the user's
    * first big-ticket purchase is observed. */
  def survivalDelta(batch: DataFrame): DataFrame =
    batch.groupBy("user_id").agg(
      min(unix_micros(col("ts"))).as("f_us"),
      max(unix_micros(col("ts"))).as("l_us"),
      min(when(col("event_type") === "purchase" &&
        expr("cast(round(value * 100.0) as bigint)")
          >= KaplanMeier.bigCents,
        unix_micros(col("ts")))).as("p_us"))

  def store(storePath: String): MonoidStore =
    new MonoidStore(storePath,
      MonoidStore.aggReduce(sumCols = Nil,
        minCols = Seq("f_us", "p_us"), maxCols = Seq("l_us")))

  def appendSurvivalBatch(spark: SparkSession, batch: DataFrame,
                          storePath: String, batchId: Long): Unit =
    store(storePath).append(survivalDelta(batch), batchId)

  /** The (f_us, l_us, p_us) per-user clock table. */
  def clockView(spark: SparkSession, storePath: String): DataFrame =
    store(storePath).merged(spark)

  /** Live life table ≡ [[KaplanMeier.qKaplanMeier]] over absorbed
    * events. */
  def kmView(spark: SparkSession, storePath: String): DataFrame =
    KaplanMeier.lifeTable(clockView(spark, storePath))

  private def armedPerUser(spark: SparkSession,
                           storePath: String): DataFrame =
    clockView(spark, storePath)
      .withColumn("arm", AbTest.armOf(col("user_id")))
      .select(col("arm"),
        when(col("p_us").isNotNull, 1L).otherwise(0L).as("event"),
        expr(s"(coalesce(p_us, l_us) - f_us) div ${86400000000L}")
          .as("t_days"))

  /** Live Mantel readout ≡ [[LogRank.logRank]]. */
  def logRankView(spark: SparkSession, storePath: String): DataFrame =
    LogRank.logRankFromPerUser(armedPerUser(spark, storePath))

  /** Live RMST ≡ [[Rmst.rmst]]. */
  def rmstView(spark: SparkSession, storePath: String): DataFrame =
    Rmst.rmstFromPerUser(armedPerUser(spark, storePath))

  /** Wire the event-file stream; `compactEvery` > 0 enables the
    * cadenced fold. */
  def runSurvivalStream(spark: SparkSession, uploadDir: String,
                        storePath: String, checkpointDir: String,
                        schema: StructType,
                        compactEvery: Int = 0): StreamingQuery = {
    val st = store(storePath)
    st.recover(spark)
    CurationStream.runFileStream(spark, uploadDir, checkpointDir, schema) {
      (batch, id) =>
        appendSurvivalBatch(spark, batch, storePath, id)
        st.maybeCompact(spark, id, compactEvery)
    }
  }
}
