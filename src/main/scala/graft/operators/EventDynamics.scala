package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** TEMPORAL BURSTINESS PROFILE (Fano 1947's dispersion index; Goh &
  * Barabási 2008, "Burstiness and memory in complex systems") — the
  * two standard answers to "is this event stream Poisson, or does it
  * arrive in bursts?", per event type:
  *
  *  - FANO FACTOR F = Var(hourly count)/Mean(hourly count) over the
  *    full calendar window (empty hours count as zeros — the global
  *    hour span H anchors the denominator). F ≈ 1 is Poisson, F > 1
  *    overdispersed/bursty, F < 1 regular. Held exact:
  *    F_micro = 10⁶·(H·Σc² − S²) div (H·S), Θ(n²) masses in
  *    DECIMAL(38,0)/HUGEINT.
  *  - BURSTINESS B = (σ−μ)/(σ+μ) of the within-user inter-arrival
  *    times (Goh-Barabási; B → −1 regular, 0 Poisson, → 1 extreme).
  *    The n denominators cancel, so B = (√(n·Σg²−S²) − S)/(√(n·Σg²−S²)
  *    + S): ONE IEEE sqrt of an exact integer, then add/div — the
  *    AbTest float-channel convention, replayed token for token by
  *    the oracle.
  *
  * SCALE SHAPE. Fano leg: one (type, hour) partial-agg shuffle, then
  * per-type moments over the bounded hourly spine. Burstiness leg:
  * inter-arrival gaps via a lag window partitioned by (user, type) —
  * per-user partitions, never a per-type global sort — pooled to
  * per-type integer moments in the same pass. Output is |types| rows.
  */
object EventDynamics {

  /** Fano leg over an (event_type, hour, c) rollup — the shared
    * definition the batch query AND the hourly-count-store
    * [[graft.streaming.EventStreams.fanoView]] both consume. The span
    * H counts CALENDAR HOUR BUCKETS (max hour − min hour + 1), so a
    * store that only keeps the rollup reproduces the statistic
    * exactly. */
  def fanoOverHourly(hourly: DataFrame): DataFrame = {
    val hoursSpan = hourly.agg(
      (max(col("hour")) - min(col("hour")) + 1L).as("h"))
    hourly.groupBy("event_type")
      .agg(count(lit(1)).as("n_hours_occupied"),
        sum("c").as("s_c"),
        expr("sum(cast(c as decimal(38,0)) * c)").as("sq_c"))
      .crossJoin(broadcast(hoursSpan))
      .select(col("event_type"), col("n_hours_occupied"),
        col("s_c").as("n_events"),
        expr("""case when s_c = 0 then 0L else cast(
                | (1000000L * (cast(h as decimal(38,0)) * sq_c
                |              - cast(s_c as decimal(38,0)) * s_c))
                |   div (cast(h as decimal(38,0)) * s_c) as bigint) end"""
          .stripMargin.replace("\n", " ")).as("fano_micro"))
  }

  def burstiness(events: DataFrame): DataFrame = {
    // hourly counts per type; empty hours enter via the global span H
    val hourly = events
      .groupBy(col("event_type"),
        expr("unix_micros(ts) div 3600000000").as("hour"))
      .agg(count(lit(1)).as("c"))
    val fano = fanoOverHourly(hourly)
    // within-user inter-arrival gaps (seconds), pooled per type
    val w = Window.partitionBy("user_id", "event_type")
      .orderBy(col("ts").asc, col("event_id").asc)
    val gaps = events
      .select(col("event_type"),
        (unix_micros(col("ts"))
          - unix_micros(lag(col("ts"), 1).over(w))).as("gm"))
      .select(col("event_type"), expr("gm div 1000000").as("g"))
      .filter(col("g").isNotNull)
    val burst = gaps.groupBy("event_type")
      .agg(count(lit(1)).as("n_gaps"),
        sum("g").as("s_g"),
        expr("sum(cast(g as decimal(38,0)) * g)").as("sq_g"))
      .select(col("event_type"), col("n_gaps"),
        expr("""case when n_gaps = 0 or
                |     (cast(n_gaps as decimal(38,0)) * sq_g
                |      - cast(s_g as decimal(38,0)) * s_g = 0
                |     and s_g = 0) then 0L else
                | cast(round(1000000.0 *
                |   (sqrt(cast(cast(n_gaps as decimal(38,0)) * sq_g
                |         - cast(s_g as decimal(38,0)) * s_g as double))
                |     - cast(s_g as double))
                |   / (sqrt(cast(cast(n_gaps as decimal(38,0)) * sq_g
                |         - cast(s_g as decimal(38,0)) * s_g as double))
                |     + cast(s_g as double))) as bigint) end"""
          .stripMargin.replace("\n", " ")).as("burstiness_micro"))
    fano.join(burst, Seq("event_type"), "left")
      .na.fill(0L, Seq("n_gaps", "burstiness_micro"))
      .select(col("event_type"), col("n_events"),
        col("n_hours_occupied"), col("fano_micro"), col("n_gaps"),
        col("burstiness_micro"))
      .orderBy("event_type")
  }

  def qBurstiness(spark: SparkSession, dir: String): DataFrame =
    burstiness(Tables(spark, dir, "events"))

  val qBurstinessSql: String =
    """WITH hourly AS MATERIALIZED (
      |  SELECT event_type,
      |    epoch_us(ts) // 3600000000 AS hour,
      |    CAST(COUNT(*) AS BIGINT) AS c
      |  FROM events GROUP BY 1, 2),
      |span AS (SELECT MAX(hour) - MIN(hour) + 1 AS h FROM hourly),
      |fano AS (
      |  SELECT event_type,
      |    CAST(COUNT(*) AS BIGINT) AS n_hours_occupied,
      |    CAST(SUM(c) AS BIGINT) AS s_c,
      |    CAST(SUM(CAST(c AS HUGEINT) * c) AS HUGEINT) AS sq_c
      |  FROM hourly GROUP BY 1),
      |gaps AS (
      |  SELECT event_type,
      |    (epoch_us(ts) - epoch_us(lag(ts, 1) OVER (
      |      PARTITION BY user_id, event_type
      |      ORDER BY ts ASC, event_id ASC))) // 1000000 AS g
      |  FROM events),
      |burst AS (
      |  SELECT event_type,
      |    CAST(COUNT(*) AS BIGINT) AS n_gaps,
      |    CAST(COALESCE(SUM(g), 0) AS BIGINT) AS s_g,
      |    CAST(COALESCE(SUM(CAST(g AS HUGEINT) * g), 0) AS HUGEINT) AS sq_g
      |  FROM gaps WHERE g IS NOT NULL GROUP BY 1)
      |SELECT f.event_type, f.s_c AS n_events, f.n_hours_occupied,
      |  CASE WHEN f.s_c = 0 THEN 0 ELSE CAST(
      |    (1000000 * (CAST(span.h AS HUGEINT) * f.sq_c
      |                - CAST(f.s_c AS HUGEINT) * f.s_c))
      |      // (CAST(span.h AS HUGEINT) * f.s_c) AS BIGINT) END
      |    AS fano_micro,
      |  COALESCE(b.n_gaps, 0) AS n_gaps,
      |  COALESCE(CASE WHEN b.n_gaps = 0
      |      OR (CAST(b.n_gaps AS HUGEINT) * b.sq_g
      |          - CAST(b.s_g AS HUGEINT) * b.s_g = 0 AND b.s_g = 0)
      |    THEN 0 ELSE
      |    CAST(ROUND(1000000.0 *
      |      (sqrt(CAST(CAST(b.n_gaps AS HUGEINT) * b.sq_g
      |            - CAST(b.s_g AS HUGEINT) * b.s_g AS DOUBLE))
      |        - CAST(b.s_g AS DOUBLE))
      |      / (sqrt(CAST(CAST(b.n_gaps AS HUGEINT) * b.sq_g
      |            - CAST(b.s_g AS HUGEINT) * b.s_g AS DOUBLE))
      |        + CAST(b.s_g AS DOUBLE))) AS BIGINT) END, 0)
      |    AS burstiness_micro
      |FROM fano f LEFT JOIN burst b ON b.event_type = f.event_type
      |CROSS JOIN span
      |ORDER BY f.event_type""".stripMargin
}
