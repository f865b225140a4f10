package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Event-stream analytics over the `events` table (ts / user_id /
  * event_type / value / props-JSON) — the batch halves of the streaming
  * surface in [[graft.streaming]]: the same windowed aggregation and
  * sessionization semantics, expressed relationally so the driver can
  * oracle-check them, with the Structured Streaming counterparts
  * spec-checked for agreement.
  *
  * Scale shapes:
  *  - windowed agg: date_trunc is map-side; the groupBy shuffles
  *    |buckets × types| rows after partial aggregation — the canonical
  *    time-series rollup at any scale;
  *  - sessionization: one shuffle on user_id (the lag + cumulative-sum
  *    windows and the final groupBy all share that partitioning, so
  *    Catalyst plans a single exchange) — never a global window;
  *  - JSON extraction: map-only projection, codegen'd `get_json_object`
  *    (JsonPath over UTF8String, no UDF).
  */
object Events {

  /** Session gap: a pause of more than this many microseconds of event
    * time starts a new session (classic 30-minute web-analytics gap). */
  val sessionGapMicros: Long = 30L * 60 * 1000000

  /** Tumbling 1-hour windowed aggregation: count + exact sum(value) per
    * (hour, event_type). `value` is money-like 2-dp → [[Aggregates.dsum]]
    * keeps the sum order-independent and bit-identical to the oracle. */
  def qEventsWindow(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "events")
      .groupBy(date_trunc("hour", col("ts")).as("ws"),
        col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        Aggregates.dsum(col("value")).as("sum_value"))

  val qEventsWindowSql: String =
    """SELECT date_trunc('hour', ts) AS ws, event_type,
      |  COUNT(*) AS n_events,
      |  CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS DOUBLE) / 100.0
      |    AS sum_value
      |FROM events
      |GROUP BY 1, 2""".stripMargin

  /** Gap-based sessionization, batch formulation: per user, a new
    * session starts when the gap to the previous event exceeds
    * [[sessionGapMicros]]; session_id = running count of session starts
    * (lag + cumulative sum over the same user_id/ts order, so one
    * exchange serves both windows and the final rollup). Event-time ties
    * are broken by event_id for a total order. */
  def qSessionize(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables(spark, dir, "events")
      .select(col("user_id"), col("event_id"), col("ts"),
        unix_micros(col("ts")).as("us"))
    val order = Window.partitionBy("user_id")
      .orderBy(col("ts"), col("event_id"))
    val newSession = when(
      col("us") - lag(col("us"), 1).over(order) > sessionGapMicros, 1L)
      .otherwise(0L)
    ev.withColumn("new_session", newSession)
      .withColumn("session_id",
        sum(col("new_session")).over(
          order.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("user_id", "session_id")
      .agg(min(col("ts")).as("session_start"),
        max(col("ts")).as("session_end"),
        count(lit(1)).as("n_events"))
  }

  val qSessionizeSql: String =
    s"""WITH flagged AS (
      |  SELECT user_id, event_id, ts,
      |    CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER w
      |              > $sessionGapMicros
      |         THEN 1 ELSE 0 END AS new_session
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
      |), numbered AS (
      |  SELECT user_id, ts,
      |    CAST(SUM(new_session) OVER (
      |      PARTITION BY user_id ORDER BY ts, event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      |      AS session_id
      |  FROM flagged
      |)
      |SELECT user_id, session_id,
      |  MIN(ts) AS session_start, MAX(ts) AS session_end,
      |  COUNT(*) AS n_events
      |FROM numbered GROUP BY 1, 2""".stripMargin

  /** Pivot — long-to-wide reshaping: per-user event counts, one column
    * per event type. The value list is EXPLICIT: `pivot(col)` without
    * values first runs a distinct job over the corpus to discover them
    * and caps at `spark.sql.pivotMaxValues` — at 100 TB the enumerated
    * form is one pass, plans as an ordinary grouping aggregation, and
    * fails loudly if a new type appears instead of silently widening. */
  val eventTypes: Seq[String] =
    Seq("click", "error", "purchase", "signup", "view")

  def qPivot(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "events")
      .groupBy("user_id")
      .pivot("event_type", eventTypes)
      .agg(count(lit(1)))
      // a user with NO events of a pivoted type gets a NULL cell from
      // Spark's pivot where the oracle's COUNT(*) FILTER gives 0
      // (round-16 edge-corpus find; every main-corpus user had every
      // type, which hid it)
      .na.fill(0L, eventTypes)

  val qPivotSql: String =
    s"""SELECT user_id,
      |${eventTypes.map(t =>
        s"  COUNT(*) FILTER (event_type = '$t') AS \"$t\"").mkString(",\n")}
      |FROM events GROUP BY user_id""".stripMargin

  /** UNPIVOT — the inverse reshape of [[qPivot]], closing the
    * wide↔long pair every reporting layer needs: the wide user × type
    * count matrix melts back to (user_id, event_type, n) rows via a
    * single `stack` projection (one codegen'd Expand node — map-only,
    * no shuffle beyond the pivot's own). Dropping the zero cells the
    * pivot manufactured makes the round trip EXACT: unpivot ∘ pivot ≡
    * the plain groupBy — which is precisely what the ORACLE computes,
    * so the driver gate certifies the inversion law, not just the
    * reshape. */
  def qUnpivot(spark: SparkSession, dir: String): DataFrame = {
    val wide = qPivot(spark, dir)
    val stackExpr = s"stack(${eventTypes.length}, " +
      eventTypes.map(t => s"'$t', `$t`").mkString(", ") +
      ") AS (event_type, n)"
    wide.select(col("user_id"), expr(stackExpr))
      .filter(col("n") > 0)
  }

  val qUnpivotSql: String =
    """SELECT user_id, event_type, CAST(COUNT(*) AS BIGINT) AS n
      |FROM events GROUP BY 1, 2""".stripMargin

  /** SEASONAL-NAIVE FORECAST ERROR (the MASE decomposition) — the
    * honest baseline every traffic forecast must beat: predict each
    * hour by the same hour YESTERDAY (lag 24 on the dense spine) and
    * score it against the naive lag-1 prediction. The ratio of the two
    * absolute-error masses is Hyndman's MASE; emitting the two integer
    * SUMS (plus the double ratio, one division on both engines) keeps
    * the row hash-exact while giving the consumer the scale-free
    * statistic. Window depth is the |hours×types| ROLLUP (gap-fill
    * posture) — the lags never see event volume; silent hours are real
    * zeros, so the baseline is scored on the series a forecaster
    * would actually see. */
  def seasonalNaive(events: DataFrame): DataFrame = {
    val dense = gapFill(events)
      .select(col("event_type"), col("hour"), col("n_events").as("n"))
    val w = Window.partitionBy("event_type").orderBy("hour")
    dense
      .withColumn("lag24", lag(col("n"), 24).over(w))
      .withColumn("lag1", lag(col("n"), 1).over(w))
      .filter(col("lag24").isNotNull && col("lag1").isNotNull)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_scored"),
        sum(abs(col("n") - col("lag24"))).as("seasonal_abs_err"),
        sum(abs(col("n") - col("lag1"))).as("naive_abs_err"))
      .withColumn("mase",
        col("seasonal_abs_err").cast("double") /
          col("naive_abs_err").cast("double"))
  }

  def qSeasonalNaive(spark: SparkSession, dir: String): DataFrame =
    seasonalNaive(Tables(spark, dir, "events"))

  val qSeasonalNaiveSql: String =
    """WITH hourly AS (
      |  SELECT event_type, date_trunc('hour', ts) AS hour, COUNT(*) AS n
      |  FROM events GROUP BY 1, 2),
      |span AS (
      |  SELECT event_type, min(hour) AS h0, max(hour) AS h1
      |  FROM hourly GROUP BY 1),
      |spine AS (
      |  SELECT event_type,
      |    unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS hour
      |  FROM span),
      |dense AS (
      |  SELECT s.event_type, s.hour, CAST(coalesce(h.n, 0) AS BIGINT) AS n
      |  FROM spine s LEFT JOIN hourly h
      |    ON s.event_type = h.event_type AND s.hour = h.hour),
      |lagged AS (
      |  SELECT event_type, n,
      |    lag(n, 24) OVER w AS lag24, lag(n, 1) OVER w AS lag1
      |  FROM dense
      |  WINDOW w AS (PARTITION BY event_type ORDER BY hour)
      |)
      |SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_scored,
      |  CAST(SUM(ABS(n - lag24)) AS BIGINT) AS seasonal_abs_err,
      |  CAST(SUM(ABS(n - lag1)) AS BIGINT) AS naive_abs_err,
      |  CAST(SUM(ABS(n - lag24)) AS DOUBLE)
      |    / CAST(SUM(ABS(n - lag1)) AS DOUBLE) AS mase
      |FROM lagged
      |WHERE lag24 IS NOT NULL AND lag1 IS NOT NULL
      |GROUP BY 1""".stripMargin

  /** Exact continuous percentiles per event type (both engines use the
    * same (1-d)·lower + d·upper interpolation). Exact ordered statistics
    * sort each group — the honest cost; the constant-memory scale path
    * is `approx_percentile` (same plan family as the HLL sketch pair in
    * Similarity), kept out of the oracle query because sketch estimates
    * are engine-specific. */
  def qQuantiles(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "events")
      .groupBy("event_type")
      .agg(
        expr("percentile(value, 0.5)").as("p50"),
        expr("percentile(value, 0.9)").as("p90"),
        expr("percentile(value, 0.99)").as("p99"))

  val qQuantilesSql: String =
    """SELECT event_type,
      |  quantile_cont(value, 0.5) AS p50,
      |  quantile_cont(value, 0.9) AS p90,
      |  quantile_cont(value, 0.99) AS p99
      |FROM events GROUP BY event_type""".stripMargin

  /** ROBUST Z-SCORE OUTLIERS (median/MAD) — the third member of the
    * monitoring trio beside the trailing-ratio spike score
    * ([[anomalyOver]]) and the sustained-drift CUSUM ([[cusum]]): a
    * mean/stddev z-score is poisoned by the very outliers it hunts
    * (one 100× hour inflates σ until nothing is 3σ out), so the robust
    * form centers on the MEDIAN and scales by the MEDIAN absolute
    * deviation — 50% breakdown point, the monitoring-statistics
    * standard (Hampel). Two exact grouped percentiles (the
    * [[qQuantiles]] machinery) over the DENSE hourly rollup, a
    * broadcast join of the |types|-row med/mad table back onto the
    * spine, and a map-only score: 1.4826·MAD estimates σ under
    * normality, so |z| > 3.5 is the usual Hampel cut. Everything after
    * the first partial agg runs over |hours × types| rows. */
  def robustZ(events: DataFrame): DataFrame = {
    val dense = gapFill(events)
      .select(col("event_type"), col("hour"), col("n_events").as("n"))
    val med = dense.groupBy("event_type")
      .agg(expr("percentile(n, 0.5)").as("med"))
    val mad = dense.join(broadcast(med), "event_type")
      .groupBy("event_type")
      .agg(expr("percentile(abs(n - med), 0.5)").as("mad"))
    dense
      .join(broadcast(med), "event_type")
      .join(broadcast(mad), "event_type")
      // MAD = 0 (>50% of hours identical — a flat or very sparse type)
      // has no finite scale: z is NULL and ANY deviation from the
      // median flags. Spelled as an explicit CASE on both engines —
      // ANSI Spark errors on the division and DuckDB would return ±inf,
      // so the degenerate branch must never evaluate the ratio.
      .withColumn("z", when(col("mad") > 0,
        (col("n").cast("double") - col("med")) / (lit(1.4826) * col("mad"))))
      .withColumn("is_outlier",
        when(col("mad") > 0, abs(col("z")) > 3.5)
          .otherwise(col("n").cast("double") =!= col("med"))
          .cast("integer"))
      .select("event_type", "hour", "n", "med", "mad", "z", "is_outlier")
  }

  def qRobustZ(spark: SparkSession, dir: String): DataFrame =
    robustZ(Tables(spark, dir, "events"))

  val qRobustZSql: String =
    """WITH hourly AS (
      |  SELECT event_type, date_trunc('hour', ts) AS hour, COUNT(*) AS n
      |  FROM events GROUP BY 1, 2),
      |span AS (
      |  SELECT event_type, min(hour) AS h0, max(hour) AS h1
      |  FROM hourly GROUP BY 1),
      |spine AS (
      |  SELECT event_type,
      |    unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS hour
      |  FROM span),
      |dense AS (
      |  SELECT s.event_type, s.hour, CAST(coalesce(h.n, 0) AS BIGINT) AS n
      |  FROM spine s LEFT JOIN hourly h
      |    ON s.event_type = h.event_type AND s.hour = h.hour),
      |med AS (
      |  SELECT event_type, quantile_cont(n, 0.5) AS med
      |  FROM dense GROUP BY 1),
      |mad AS (
      |  SELECT d.event_type, quantile_cont(abs(d.n - m.med), 0.5) AS mad
      |  FROM dense d JOIN med m USING (event_type) GROUP BY 1)
      |SELECT d.event_type, d.hour, d.n, m.med, a.mad,
      |  CASE WHEN a.mad > 0
      |    THEN (CAST(d.n AS DOUBLE) - m.med) / (1.4826 * a.mad) END AS z,
      |  CAST(CASE WHEN a.mad > 0
      |    THEN abs((CAST(d.n AS DOUBLE) - m.med) / (1.4826 * a.mad)) > 3.5
      |    ELSE CAST(d.n AS DOUBLE) <> m.med END AS INTEGER) AS is_outlier
      |FROM dense d JOIN med m USING (event_type)
      |JOIN mad a USING (event_type)""".stripMargin

  /** JSON property extraction from the `props` column (every training
    * pipeline parses sidecar JSON metadata): pull `$.k` as a typed
    * column and keep the raw event key. */
  def qJsonProps(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "events")
      .select(col("event_id"),
        get_json_object(col("props"), "$.k").cast("bigint").as("k"))

  /** json_valid guard (round-16 edge-corpus find): Spark's
    * get_json_object returns NULL for malformed/empty props where
    * DuckDB's json_extract_string ERRORS — the guard makes the oracle
    * reproduce Spark's null-on-malformed contract. */
  val qJsonPropsSql: String =
    """SELECT event_id,
      |  CASE WHEN json_valid(props)
      |    THEN CAST(json_extract_string(props, '$.k') AS BIGINT)
      |    END AS k
      |FROM events""".stripMargin

  /** COHORT RETENTION MATRIX — the other product-analytics classic:
    * bucket every user into the week of their FIRST event (their
    * cohort), then for each (cohort_week, week_offset ≥ 0) count the
    * distinct users of that cohort active in that week. Output is the
    * upper-triangular retention matrix product teams read as "how many
    * of the week-N signups were still active k weeks later".
    *
    * Plan shape, built for the 100 TB case where users number in the
    * billions: (1) per-user first-seen week = one partial-agg min over
    * the scan; (2) the (user, active-week) set is a distinct over
    * map-side-truncated pairs; (3) the cohort join keys BOTH sides on
    * user_id — co-partitioned shuffle join, never broadcast (the user
    * dim is a fact at scale); (4) the final count-distinct groups by
    * (cohort, offset) — cells are |weeks|² / 2, driver-tiny, but the
    * count_distinct inside each cell re-shuffles by (cell, user), the
    * standard exact-distinct expansion. Every stage is bounded by
    * distinct (user, week) pairs — event volume collapses at the first
    * partial aggregation. */
  def cohortRetention(events: DataFrame): DataFrame = {
    val wk = date_trunc("week", col("ts"))
    val userWeeks = events.select(col("user_id"), wk.as("week")).distinct()
    val cohorts = events.groupBy("user_id")
      .agg(date_trunc("week", min(col("ts"))).as("cohort_week"))
    userWeeks.join(cohorts, "user_id")
      .groupBy(col("cohort_week"),
        // both sides are week-truncated, so the day diff is an exact
        // multiple of 7 and the cast-truncation is exact division
        (datediff(col("week"), col("cohort_week")) / 7)
          .cast("long").as("week_offset"))
      .agg(count_distinct(col("user_id")).as("n_active"))
  }

  def qCohort(spark: SparkSession, dir: String): DataFrame =
    cohortRetention(Tables(spark, dir, "events"))

  val qCohortSql: String =
    """WITH uw AS (
      |  SELECT DISTINCT user_id, date_trunc('week', ts) AS week
      |  FROM events),
      |c AS (
      |  SELECT user_id, date_trunc('week', min(ts)) AS cohort_week
      |  FROM events GROUP BY user_id)
      |SELECT c.cohort_week,
      |  CAST(date_diff('day', c.cohort_week, uw.week) // 7 AS BIGINT)
      |    AS week_offset,
      |  CAST(COUNT(DISTINCT uw.user_id) AS BIGINT) AS n_active
      |FROM uw JOIN c ON uw.user_id = c.user_id
      |GROUP BY 1, 2""".stripMargin

  /** ROLLING 7-DAY ACTIVE USERS — exact sliding-window distinct counts
    * (the DAU/WAU board metric) without a window function: a sliding
    * count-distinct cannot partial-aggregate (distinct sets don't
    * merge by subtraction), so the scalable formulation EXPLODES each
    * distinct (user, day) pair into the 7 report days it contributes
    * to, then runs one exact count-distinct per report day. Cost is a
    * fixed 7× amplification of the DEDUPED pair set (not the event
    * volume) and two shuffles — versus the naive per-day self-join's
    * |days| scans. Report days are restricted to those with actual
    * activity (inner semantics; a day with zero activity in range
    * would need a calendar spine — deliberately out of scope of the
    * oracle-checked surface). */
  def rollingActive(events: DataFrame, windowDays: Int = 7): DataFrame = {
    val userDays = events
      .select(col("user_id"),
        date_trunc("day", col("ts")).cast("date").as("day"))
      .distinct()
    val activityDays = userDays.select(col("day")).distinct()
    userDays
      .select(col("user_id"), explode(sequence(col("day"),
        date_add(col("day"), windowDays - 1))).as("report_day"))
      .join(activityDays.select(col("day").as("report_day")), "report_day")
      .groupBy("report_day")
      .agg(count_distinct(col("user_id")).as("n_active_7d"))
      // dates surface as midnight timestamps so the driver's oracle
      // compare (which stringifies both engines' values) sees one form
      .withColumn("report_day", col("report_day").cast("timestamp"))
  }

  def qRollingActive(spark: SparkSession, dir: String): DataFrame =
    rollingActive(Tables(spark, dir, "events"))

  val qRollingActiveSql: String =
    """WITH ud AS (
      |  SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS DATE) AS day
      |  FROM events),
      |days AS (SELECT DISTINCT day FROM ud)
      |SELECT CAST(d.day AS TIMESTAMP) AS report_day,
      |  CAST(COUNT(DISTINCT ud.user_id) AS BIGINT) AS n_active_7d
      |FROM days d
      |JOIN ud ON ud.day BETWEEN d.day - 6 AND d.day
      |GROUP BY 1""".stripMargin

  /** Sketch size for [[qRollingHll]] — same budget as
    * [[graft.ext.Similarity.kmvK]] (error ≈ 1/√k ≈ 12.5%); windows
    * whose distinct count is under k are EXACT (60-bit hashes don't
    * collide at corpus scale). */
  val rollingKmvK = 64

  /** ROLLING DISTINCT VIA MERGEABLE SKETCHES — the 100 TB form of
    * [[rollingActive]]: the exact operator explodes the (user, day)
    * PAIR SET 7× (fine while |users·days| shuffles comfortably); this
    * twin explodes only per-day KMV SKETCHES — a constant ≤k rows per
    * day — so the window merge costs |days|·7·k regardless of user
    * volume. That trade (per-day partial sketch, window = sketch
    * merge) is exactly how production rolling-distinct dashboards
    * stay sublinear, and KMV's merge is closed under it: the bottom-k
    * of unioned bottom-k sketches IS the bottom-k of the unioned key
    * sets, so a window's sketch is the same object a single-pass
    * sketch of the window would be — no compounding of error across
    * the merge.
    *
    * Per-day bottom-k plans as a rank-≤-k window — Spark's
    * WindowGroupLimit keeps per-group heaps BELOW the exchange (the
    * [[qTopSpenders]] observation), so no day ever shuffles more than
    * its distinct-hash stream. Deterministic end to end (md5-Horner
    * 60-bit hashes, [[graft.ext.Similarity.qApproxDistinctDet]]'s
    * estimator) — the ORACLE full-replays sketches, merge, and
    * estimates; the spec separately bounds the estimate against the
    * exact [[rollingActive]]. */
  def rollingHll(events: DataFrame, windowDays: Int = 7): DataFrame =
    rollingFromDaySketches(daySketches(events), windowDays)

  /** Per-day bottom-k sketch of the distinct user-hash stream — the
    * mergeable unit the rolling report (and the [[graft.streaming
    * .KmvStore]] incremental store) is built from. */
  def daySketches(events: DataFrame): DataFrame = {
    val dayHash = events.select(
      date_trunc("day", col("ts")).cast("date").as("day"),
      conv(substring(md5(col("user_id").cast("string").cast("binary")),
        1, 15), 16, 10).cast("bigint").as("h"))
      .distinct()
    val byDay = Window.partitionBy("day").orderBy("h")
    dayHash
      .withColumn("rk", row_number().over(byDay))
      .filter(col("rk") <= rollingKmvK).drop("rk")
  }

  /** The 7-day merge + estimator over a day-sketch table: every day
    * present in `daySketch` is an activity day (a sketch exists iff
    * the day had events), so report days derive from the sketches
    * themselves — the store needs no separate day table. */
  def rollingFromDaySketches(daySketch: DataFrame,
                             windowDays: Int = 7): DataFrame = {
    val activityDays = daySketch.select(col("day")).distinct()
    val windowHashes = daySketch
      .select(col("h"), explode(sequence(col("day"),
        date_add(col("day"), windowDays - 1))).as("report_day"))
      .join(activityDays.select(col("day").as("report_day")), "report_day")
      .distinct() // same user may appear in several merged day sketches
    val byReport = Window.partitionBy("report_day").orderBy("h")
    windowHashes
      .withColumn("rk", row_number().over(byReport))
      .filter(col("rk") <= rollingKmvK)
      .groupBy("report_day")
      .agg(count(lit(1)).cast("bigint").as("k_used"), max(col("h")).as("kth"))
      .select(col("report_day").cast("timestamp").as("report_day"),
        col("k_used"), col("kth"),
        when(col("k_used") < rollingKmvK, col("k_used").cast("double"))
          .otherwise((col("k_used").cast("double") - 1.0) *
            lit(1152921504606846976.0) / col("kth").cast("double"))
          .as("est"))
  }

  def qRollingHll(spark: SparkSession, dir: String): DataFrame =
    rollingHll(Tables(spark, dir, "events"))

  val qRollingHllSql: String =
    s"""WITH dh AS (
      |  SELECT DISTINCT CAST(date_trunc('day', ts) AS DATE) AS day,
      |    CAST(CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15)
      |      AS UBIGINT) AS BIGINT) AS h
      |  FROM events),
      |sk AS (
      |  SELECT day, h FROM (
      |    SELECT day, h, ROW_NUMBER() OVER (
      |      PARTITION BY day ORDER BY h) AS rk FROM dh)
      |  WHERE rk <= $rollingKmvK),
      |days AS (SELECT DISTINCT day FROM dh),
      |wh AS (
      |  SELECT DISTINCT d.day AS report_day, sk.h
      |  FROM days d JOIN sk ON sk.day BETWEEN d.day - 6 AND d.day),
      |merged AS (
      |  SELECT report_day, h FROM (
      |    SELECT report_day, h, ROW_NUMBER() OVER (
      |      PARTITION BY report_day ORDER BY h) AS rk FROM wh)
      |  WHERE rk <= $rollingKmvK),
      |s AS (
      |  SELECT report_day, CAST(COUNT(*) AS BIGINT) AS k_used,
      |    MAX(h) AS kth
      |  FROM merged GROUP BY 1)
      |SELECT CAST(report_day AS TIMESTAMP) AS report_day, k_used, kth,
      |  CASE WHEN k_used < $rollingKmvK THEN CAST(k_used AS DOUBLE)
      |    ELSE (CAST(k_used AS DOUBLE) - 1.0) * 1152921504606846976.0
      |      / CAST(kth AS DOUBLE) END AS est
      |FROM s""".stripMargin

  /** GROUPED TOP-K — top 3 users by exact spend per week: the "top N
    * per group" reporting classic. Expressed as rank-over-partition ≤ k
    * so Spark plans a WindowGroupLimit: the per-group limit is pushed
    * BELOW the final sort — each partition retains only its top k rows
    * before the window's shuffle, so the exchange carries k·|groups|
    * rows, not the corpus. (`.explain` shows `WindowGroupLimit`;
    * without the pushdown a week of 10⁹ purchases would all ride the
    * window shuffle.) Money sums via [[Aggregates.dsum]]'s integer-cent
    * path; ties broken by user_id for a total order both engines
    * replay. */
  def qTopSpenders(spark: SparkSession, dir: String): DataFrame = {
    val spend = Tables(spark, dir, "events")
      .filter(col("event_type") === "purchase")
      .groupBy(date_trunc("week", col("ts")).as("week"), col("user_id"))
      .agg(Aggregates.dsum(col("value")).as("spend"))
    val w = Window.partitionBy("week")
      .orderBy(col("spend").desc, col("user_id"))
    spend.withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= 3)
  }

  val qTopSpendersSql: String =
    """WITH spend AS (
      |  SELECT date_trunc('week', ts) AS week, user_id,
      |    CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS DOUBLE) / 100.0
      |      AS spend
      |  FROM events WHERE event_type = 'purchase'
      |  GROUP BY 1, 2)
      |SELECT week, user_id, spend, rk FROM (
      |  SELECT week, user_id, spend,
      |    CAST(row_number() OVER (
      |      PARTITION BY week ORDER BY spend DESC, user_id) AS BIGINT)
      |      AS rk
      |  FROM spend) r
      |WHERE rk <= 3""".stripMargin

  /** HOURLY ANOMALY SCORE — volume spikes against a trailing baseline:
    * for each (event_type, hour), the deviation of that hour's count
    * from the MEAN of the trailing 24 hours' counts (hours with data —
    * a sparse type's baseline is the mean of what exists in the
    * window), in exact per-mille: count·1000·present_hours /
    * sum(present hours), integer arithmetic — no float drift in the
    * oracle compare. The monitoring query every event pipeline runs;
    * rows far from 1000 are the pages. Plan: the hourly rollup
    * collapses event volume first (|hours × types| rows), then ONE
    * range window over the tiny rollup — window cost is independent
    * of event volume. The first hour of a type (empty trailing
    * window) emits NULL. */
  /** The baseline scoring over ANY (event_type, hour, n) frame — shared
    * by the batch driver query and the streaming monitor view
    * ([[graft.streaming.EventStreams]]'s hourly-count store): one
    * range window over the rollup, cost independent of event volume. */
  def anomalyOver(hourly: DataFrame): DataFrame = {
    val w = Window.partitionBy("event_type")
      .orderBy(expr("unix_micros(hour) div 3600000000"))
      .rangeBetween(-24, -1)
    hourly
      .withColumn("baseline_n", sum(col("n")).over(w))
      .withColumn("baseline_hours", count(col("n")).over(w))
      .withColumn("permille_of_baseline",
        when(col("baseline_hours") > 0,
          expr("n * 1000L * baseline_hours div baseline_n")))
      .select("event_type", "hour", "n", "permille_of_baseline")
  }

  def qEventAnomaly(spark: SparkSession, dir: String): DataFrame =
    anomalyOver(Tables(spark, dir, "events")
      .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("hour"))
      .agg(count(lit(1)).as("n")))

  val qEventAnomalySql: String =
    """WITH hourly AS (
      |  SELECT event_type, date_trunc('hour', ts) AS hour,
      |    COUNT(*) AS n
      |  FROM events GROUP BY 1, 2)
      |SELECT event_type, hour, n,
      |  CASE WHEN COUNT(n) OVER w > 0
      |    THEN CAST(n * 1000 * (COUNT(n) OVER w)
      |              // (SUM(n) OVER w) AS BIGINT) END
      |    AS permille_of_baseline
      |FROM hourly
      |WINDOW w AS (
      |  PARTITION BY event_type
      |  ORDER BY epoch_us(hour) // 3600000000
      |  RANGE BETWEEN 24 PRECEDING AND 1 PRECEDING)""".stripMargin

  /** Funnel step sequence, in order (the commerce classic). */
  val funnelSteps: Seq[String] = Seq("signup", "view", "click", "purchase")

  /** FUNNEL / path analysis — per user, the deepest prefix of
    * [[funnelSteps]] completed IN ORDER over the user's time-ordered
    * events, with the timestamp of each matched step. Semantics are
    * greedy earliest-match (the standard funnel definition): step 1
    * matches the user's earliest step-1 event, step i+1 the earliest
    * step-(i+1) event STRICTLY after the matched step-i time. The
    * greedy fold equals the inductive min-chain
    * `tᵢ₊₁ = min(ts | type = stepᵢ₊₁ ∧ ts > tᵢ)` by the classic
    * exchange argument — which is exactly what the ANSI oracle
    * computes, so the two formulations cross-validate.
    *
    * Plan shape: ONE scan and ONE shuffle — the groupBy(user_id)
    * collects each user's funnel-typed events via a CONDITIONAL
    * collect_list (`when(type ∈ steps, struct…)` — collect_list skips
    * nulls, so the shuffle carries only funnel-typed structs while
    * every user still gets a group, depth 0 falling out as an empty
    * array; no second scan, no distinct-users join), then a native
    * `aggregate` HOF fold — no UDF, no window, no self-join. The
    * fold's accumulator is the matched-timestamp array;
    * `try_element_at` keeps every index total under ANSI mode (NULL
    * out of range, never an error), so the whole condition stays
    * inside whole-stage codegen.
    *
    * 100 TB posture: state per user is their FUNNEL-TYPED events only
    * (the isin filter is pushed to the scan), bounded by per-user
    * activity — the same proportionality every sessionizer accepts.
    * For corpora with pathological power users, the equivalent
    * k-pass min-chain (k aggregations + broadcast-joined cutoffs, no
    * per-user array) trades k scans for O(1) state; at k = 4 the
    * single-shuffle fold wins everywhere we can measure. */
  def funnel(events: DataFrame,
             steps: Seq[String] = funnelSteps): DataFrame = {
    val k = steps.size
    val stepArr = array(steps.map(lit): _*)
    events
      .groupBy("user_id")
      .agg(array_sort(collect_list(
        when(col("event_type").isin(steps: _*), struct(
          col("ts"), col("event_id"), col("event_type"))))).as("evs"))
      .select(col("user_id"),
        aggregate(
          col("evs"),
          expr("CAST(array() AS array<timestamp>)"),
          (acc, x) => when(
            size(acc) < k &&
              x.getField("event_type") ===
                try_element_at(stepArr, size(acc) + 1) &&
              coalesce(x.getField("ts") > try_element_at(acc, lit(-1)),
                lit(true)),
            concat(acc, array(x.getField("ts")))).otherwise(acc))
          .as("m"))
      .select(col("user_id") +:
        size(col("m")).cast("long").as("depth") +:
        steps.zipWithIndex.map { case (s, i) =>
          try_element_at(col("m"), lit(i + 1)).as(s"t_$s")
        }: _*)
  }

  def qFunnel(spark: SparkSession, dir: String): DataFrame =
    funnel(Tables(spark, dir, "events"))

  /** CONVERSION-LATENCY rollup over the funnel: how many users
    * complete it, and the exact p50/p90/min/max of first-touch to
    * conversion time (matched-signup → matched-purchase, integer
    * microseconds) — the line product teams put next to the retention
    * matrix. One extra aggregation over [[funnel]]'s output (which is
    * |users|-sized, so the exact percentile's sort is over converted
    * users, not events); percentile interpolation parity with the
    * oracle is the q_quantiles precedent. */
  def qFunnelConv(spark: SparkSession, dir: String): DataFrame = {
    val lat = when(col("depth") === funnelSteps.size,
      unix_micros(col(s"t_${funnelSteps.last}")) -
        unix_micros(col(s"t_${funnelSteps.head}")))
    funnel(Tables(spark, dir, "events"))
      .select(col("depth"), lat.as("lat"))
      .agg(
        count(lit(1)).cast("long").as("n_users"),
        sum((col("depth") === funnelSteps.size).cast("bigint"))
          .as("n_converted"),
        expr("percentile(lat, 0.5)").as("p50_latency_us"),
        expr("percentile(lat, 0.9)").as("p90_latency_us"),
        min(col("lat")).as("min_latency_us"),
        max(col("lat")).as("max_latency_us"))
  }

  // lazy: composes qFunnelSql, which is declared later in this object
  lazy val qFunnelConvSql: String = {
    val first = s"t_${funnelSteps.head}"
    val last = s"t_${funnelSteps.last}"
    s"""SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
       |  CAST(SUM(CASE WHEN depth = ${funnelSteps.size} THEN 1 ELSE 0 END)
       |    AS BIGINT) AS n_converted,
       |  quantile_cont(lat, 0.5) AS p50_latency_us,
       |  quantile_cont(lat, 0.9) AS p90_latency_us,
       |  MIN(lat) AS min_latency_us,
       |  MAX(lat) AS max_latency_us
       |FROM (
       |  SELECT depth,
       |    CASE WHEN depth = ${funnelSteps.size}
       |      THEN epoch_us($last) - epoch_us($first) END AS lat
       |  FROM (${qFunnelSql.replace("\n", "\n  ")}) f) g""".stripMargin
  }

  /** EVENT TRANSITION MATRIX — first-order path analysis: for every
    * consecutive pair of events per user (time-ordered, ties by
    * event_id), count (from_type, to_type) occurrences corpus-wide.
    * The Markov view of user behavior ("what follows an error?").
    * One exchange: the lag window partitions by user_id, and the
    * |types|²-row final rollup partial-aggregates on top of it. At
    * 100 TB this is the sessionizer's exact plan shape — per-user
    * window over one shuffle, never a global sort. */
  def qEventTransitions(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    Tables(spark, dir, "events")
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("from_type", lag(col("event_type"), 1).over(w))
      .filter(col("from_type").isNotNull)
      .groupBy(col("from_type"), col("event_type").as("to_type"))
      .agg(count(lit(1)).as("n"))
  }

  val qEventTransitionsSql: String =
    """WITH seq AS (
      |  SELECT user_id, event_type,
      |    lag(event_type) OVER (
      |      PARTITION BY user_id ORDER BY ts, event_id) AS from_type
      |  FROM events)
      |SELECT from_type, event_type AS to_type, COUNT(*) AS n
      |FROM seq WHERE from_type IS NOT NULL
      |GROUP BY 1, 2""".stripMargin

  /** SESSION PATH TRIGRAMS — the 3-step extension of the first-order
    * transition matrix [[qEventTransitions]]: counts of consecutive
    * (a → b → c) event triples WITHIN a session, the clickstream
    * pattern-mining staple (what do users actually do around a
    * purchase). Where the transition matrix is Markov-1 (memoryless),
    * trigram counts expose the second-order structure a funnel
    * designer cares about.
    *
    * Plan shape: the session id and both lags ride ONE window layout
    * (partition user, order ts — the sessionizer's exchange); triples
    * never cross a session boundary (both lagged session ids must
    * match). Event volume collapses at the trigram partial agg —
    * |distinct triples| ≤ |types|³ rows out. */
  def pathTrigrams(events: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val sess = events
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("us"))
      .withColumn("new_session", when(
        col("us") - lag(col("us"), 1).over(w) > sessionGapMicros, 1L)
        .otherwise(0L))
      .withColumn("session_id", sum(col("new_session")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    sess
      .withColumn("t1", lag(col("event_type"), 2).over(w))
      .withColumn("t2", lag(col("event_type"), 1).over(w))
      .withColumn("s1", lag(col("session_id"), 2).over(w))
      .withColumn("s2", lag(col("session_id"), 1).over(w))
      .filter(col("s1") === col("session_id") &&
        col("s2") === col("session_id"))
      .groupBy(col("t1").as("step1"), col("t2").as("step2"),
        col("event_type").as("step3"))
      .agg(count(lit(1)).as("n"))
  }

  def qPathTrigrams(spark: SparkSession, dir: String): DataFrame =
    pathTrigrams(Tables(spark, dir, "events"))

  val qPathTrigramsSql: String =
    s"""WITH flagged AS (
      |  SELECT user_id, ts, event_id, event_type,
      |    CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER w
      |              > $sessionGapMicros
      |         THEN 1 ELSE 0 END AS new_session
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
      |), sess AS (
      |  SELECT user_id, ts, event_id, event_type,
      |    SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |      ROWS UNBOUNDED PRECEDING) AS session_id
      |  FROM flagged
      |), tri AS (
      |  SELECT event_type,
      |    lag(event_type, 2) OVER w AS t1, lag(event_type, 1) OVER w AS t2,
      |    lag(session_id, 2) OVER w AS s1, lag(session_id, 1) OVER w AS s2,
      |    session_id
      |  FROM sess
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
      |)
      |SELECT t1 AS step1, t2 AS step2, event_type AS step3,
      |  CAST(COUNT(*) AS BIGINT) AS n
      |FROM tri
      |WHERE s1 = session_id AND s2 = session_id
      |GROUP BY 1, 2, 3""".stripMargin

  /** INTEGER CUSUM CHANGE DETECTION over the hourly rate — the classic
    * sequential drift detector (Page 1954) beside [[anomalyOver]]'s
    * trailing-ratio spike score: a spike test fires on one bad hour;
    * CUSUM accumulates SUSTAINED excess over the expected rate and
    * fires when the cumulative drift crosses a decision interval, which
    * is what catches slow leaks (a 20% elevated error rate for six
    * hours) that never trip a per-hour threshold.
    *
    * The recurrence s_t = max(0, s_{t−1} + x_t − k) is not a window
    * function, but its closed form is: s_t = cum_t − min_{i≤t} cum_i
    * over the raw drift cumsum — a prefix sum plus a running min, two
    * frames of ONE type-partitioned window over the |hours × types|
    * ROLLUP (the gap-fill posture: event volume collapses first; the
    * dense zero-filled spine keeps silent hours draining the
    * statistic). All INTEGER: drift is scaled by |hours_type| so the
    * per-type mean rate k = total/|hours| needs no division —
    * drift_t = n_t·H − T exactly; the alarm fires at 4 mean-hours of
    * accumulated excess (cusum > 4·T). */
  def cusum(events: DataFrame): DataFrame = {
    val dense = gapFill(events)
      .select(col("event_type"), col("hour"), col("n_events").as("n"))
    val stats = dense.groupBy("event_type")
      .agg(sum(col("n")).as("total"), count(lit(1)).as("h"))
    val w = Window.partitionBy("event_type").orderBy("hour")
    val cum = dense.join(broadcast(stats), "event_type")
      .withColumn("drift", col("n") * col("h") - col("total"))
      .withColumn("cum", sum(col("drift")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("runmin", min(col("cum")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    cum
      .withColumn("cusum", col("cum") - col("runmin"))
      .withColumn("alarm",
        (col("cusum") > col("total") * 4).cast("integer"))
      .select("event_type", "hour", "n", "cusum", "alarm")
  }

  def qCusum(spark: SparkSession, dir: String): DataFrame =
    cusum(Tables(spark, dir, "events"))

  val qCusumSql: String =
    """WITH hourly AS (
      |  SELECT event_type, date_trunc('hour', ts) AS hour, COUNT(*) AS n
      |  FROM events GROUP BY 1, 2),
      |span AS (
      |  SELECT event_type, min(hour) AS h0, max(hour) AS h1
      |  FROM hourly GROUP BY 1),
      |spine AS (
      |  SELECT event_type,
      |    unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS hour
      |  FROM span),
      |dense AS (
      |  SELECT s.event_type, s.hour,
      |    CAST(coalesce(h.n, 0) AS BIGINT) AS n
      |  FROM spine s LEFT JOIN hourly h
      |    ON s.event_type = h.event_type AND s.hour = h.hour),
      |stats AS (
      |  SELECT event_type, CAST(SUM(n) AS BIGINT) AS total,
      |    CAST(COUNT(*) AS BIGINT) AS h
      |  FROM dense GROUP BY 1),
      |cum AS (
      |  SELECT d.event_type, d.hour, d.n, st.total,
      |    CAST(SUM(d.n * st.h - st.total) OVER (
      |      PARTITION BY d.event_type ORDER BY d.hour
      |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
      |  FROM dense d JOIN stats st USING (event_type)),
      |runs AS (
      |  SELECT *, MIN(cum) OVER (
      |      PARTITION BY event_type ORDER BY hour
      |      ROWS UNBOUNDED PRECEDING) AS runmin
      |  FROM cum)
      |SELECT event_type, hour, n, cum - runmin AS cusum,
      |  CAST(cum - runmin > total * 4 AS INTEGER) AS alarm
      |FROM runs""".stripMargin

  /** GAP-FILL TIME SPINE — the missing half of every time-series rollup:
    * a tumbling-window aggregate emits rows only for buckets WITH data,
    * but dashboards, anomaly baselines and downstream joins need a dense
    * series. Per event type, generate the full hourly spine from that
    * type's first to last active hour (`sequence` + `explode` over the
    * |types|-row span table — never over event volume), left-join the
    * hourly rollup, zero-fill counts, and forward-fill the last observed
    * hourly sum (`last(_, ignoreNulls)` over the spine order — the
    * classic LOCF imputation).
    *
    * Plan shape: event volume collapses at the FIRST partial aggregation
    * (|hours × types| rows); everything after — span, spine, join,
    * window — runs over that rollup, so the spine's cost is independent
    * of corpus size. The first spine row of each type always has data
    * (the span starts at an observed hour), so ffill_sum is total. */
  def gapFill(events: DataFrame): DataFrame = {
    val hourly = events
      .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("hour"))
      .agg(count(lit(1)).as("n"), Aggregates.dsum(col("value")).as("sv"))
    val spine = hourly
      .groupBy("event_type")
      .agg(min(col("hour")).as("h0"), max(col("hour")).as("h1"))
      .select(col("event_type"),
        explode(sequence(col("h0"), col("h1"),
          expr("interval 1 hour"))).as("hour"))
    val w = Window.partitionBy("event_type").orderBy("hour")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    spine.join(hourly, Seq("event_type", "hour"), "left")
      .select(col("event_type"), col("hour"),
        coalesce(col("n"), lit(0L)).as("n_events"),
        col("n").isNull.cast("int").as("is_gap"),
        last(col("sv"), ignoreNulls = true).over(w).as("ffill_sum"))
  }

  def qGapFill(spark: SparkSession, dir: String): DataFrame =
    gapFill(Tables(spark, dir, "events"))

  val qGapFillSql: String =
    """WITH hourly AS (
      |  SELECT event_type, date_trunc('hour', ts) AS hour,
      |    COUNT(*) AS n,
      |    CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS DOUBLE) / 100.0
      |      AS sv
      |  FROM events GROUP BY 1, 2),
      |span AS (
      |  SELECT event_type, min(hour) AS h0, max(hour) AS h1
      |  FROM hourly GROUP BY 1),
      |spine AS (
      |  SELECT event_type,
      |    unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS hour
      |  FROM span)
      |SELECT s.event_type, s.hour,
      |  CAST(coalesce(h.n, 0) AS BIGINT) AS n_events,
      |  CAST(h.n IS NULL AS INTEGER) AS is_gap,
      |  last_value(h.sv IGNORE NULLS) OVER (
      |    PARTITION BY s.event_type ORDER BY s.hour
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ffill_sum
      |FROM spine s
      |LEFT JOIN hourly h
      |  ON s.event_type = h.event_type AND s.hour = h.hour""".stripMargin

  /** GAPS-AND-ISLANDS — collapse each user's consecutive run of
    * same-typed events into one validity interval (start, end, length):
    * the SCD2/run-length primitive behind "state history" tables
    * (sessions of a status column, contiguous error bursts, …). The
    * classic two-row_number difference: rn(user) − rn(user, type) is
    * constant exactly within a run, so a groupBy on it yields the
    * islands — no self-join, no iterative collapse.
    *
    * Plan shape: both windows and the final groupBy cluster on user_id
    * (HashPartitioning(user_id) satisfies the (user_id, type) window's
    * ClusteredDistribution), so Catalyst plans ONE exchange with two
    * sorts over it — the sessionizer's shape, never a global window.
    * Event-time ties are broken by event_id for a total order both
    * engines replay. */
  def islands(events: DataFrame): DataFrame = {
    val w1 = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val w2 = Window.partitionBy("user_id", "event_type")
      .orderBy(col("ts"), col("event_id"))
    events
      .select(col("user_id"), col("event_id"), col("ts"), col("event_type"))
      .withColumn("grp",
        row_number().over(w1) - row_number().over(w2))
      .groupBy("user_id", "event_type", "grp")
      .agg(min(col("ts")).as("island_start"), max(col("ts")).as("island_end"),
        count(lit(1)).as("n_events"))
      .drop("grp")
  }

  def qIslands(spark: SparkSession, dir: String): DataFrame =
    islands(Tables(spark, dir, "events"))

  val qIslandsSql: String =
    """WITH numbered AS (
      |  SELECT user_id, event_type, ts,
      |    row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id)
      |      - row_number() OVER (
      |          PARTITION BY user_id, event_type ORDER BY ts, event_id)
      |      AS grp
      |  FROM events)
      |SELECT user_id, event_type,
      |  MIN(ts) AS island_start, MAX(ts) AS island_end,
      |  COUNT(*) AS n_events
      |FROM numbered GROUP BY user_id, event_type, grp""".stripMargin

  /** Attribution lookback: a purchase is credited to the last click at
    * most this many microseconds before it (the ad-tech 30-minute
    * last-touch window). */
  val attributionWindowMicros: Long = 30L * 60 * 1000000

  /** LAST-TOUCH ATTRIBUTION — for every purchase, the most recent click
    * by the same user within the lookback window (the join every
    * marketing pipeline runs between two event streams). Expressed as
    * ONE running window instead of a self-join: order each user's
    * click/purchase events by (ts, event_id), carry the last click
    * timestamp forward (`last(when(click, ts), ignoreNulls)` over the
    * strictly-preceding frame), and a purchase row is attributed when
    * that carried click is within the window. The streaming twin
    * ([[graft.streaming]]) is the stream-stream interval join; this
    * batch formulation is its oracle.
    *
    * Plan shape: the `isin(click, purchase)` filter is pushed to the
    * scan; everything else is one user_id exchange + sort — per-user
    * state is a single timestamp, so the operator survives any corpus
    * size that sessionization does. */
  def attribution(events: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val lastClick = last(
      when(col("event_type") === "click", col("ts")), ignoreNulls = true)
      .over(w)
    events
      .filter(col("event_type").isin("click", "purchase"))
      .select(col("user_id"), col("event_id"), col("ts"),
        col("event_type"), col("value"))
      .withColumn("lc", lastClick)
      .filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"), col("value"),
        when(unix_micros(col("ts")) - unix_micros(col("lc"))
          <= attributionWindowMicros, col("lc")).as("click_ts"))
      .withColumn("attributed", col("click_ts").isNotNull.cast("int"))
  }

  def qAttribution(spark: SparkSession, dir: String): DataFrame =
    attribution(Tables(spark, dir, "events"))

  val qAttributionSql: String =
    s"""WITH cp AS (
      |  SELECT user_id, event_id, ts, event_type, value,
      |    last_value(CASE WHEN event_type = 'click' THEN ts END
      |      IGNORE NULLS) OVER (
      |      PARTITION BY user_id ORDER BY ts, event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS lc
      |  FROM events WHERE event_type IN ('click', 'purchase'))
      |SELECT event_id, user_id, ts, value,
      |  CASE WHEN epoch_us(ts) - epoch_us(lc) <= $attributionWindowMicros
      |    THEN lc END AS click_ts,
      |  CAST((CASE WHEN epoch_us(ts) - epoch_us(lc)
      |    <= $attributionWindowMicros THEN lc END) IS NOT NULL AS INTEGER)
      |    AS attributed
      |FROM cp WHERE event_type = 'purchase'""".stripMargin

  /** The min-chain formulation — each CTE's tᵢ₊₁ is the earliest
    * step-(i+1) event strictly after tᵢ; provably the greedy fold. */
  val qFunnelSql: String = {
    val steps = funnelSteps
    val chain = steps.zipWithIndex.map { case (s, i) =>
      if (i == 0)
        s"""s0 AS (
           |  SELECT user_id, min(ts) AS t_$s FROM events
           |  WHERE event_type = '$s' GROUP BY user_id)"""
      else
        s"""s$i AS (
           |  SELECT e.user_id, min(e.ts) AS t_$s FROM events e
           |  JOIN s${i - 1} p ON e.user_id = p.user_id
           |  WHERE e.event_type = '$s' AND e.ts > p.t_${steps(i - 1)}
           |  GROUP BY e.user_id)"""
    }.mkString(",\n")
    val depth = steps.indices.reverse.map(i =>
      s"WHEN t_${steps(i)} IS NOT NULL THEN ${i + 1}")
      .mkString(" ")
    s"""WITH u AS (SELECT DISTINCT user_id FROM events),
       |$chain
       |SELECT u.user_id,
       |  CAST(CASE $depth ELSE 0 END AS BIGINT) AS depth,
       |${steps.map(s => s"  t_$s").mkString(",\n")}
       |FROM u
       |${steps.indices.map(i =>
          s"LEFT JOIN s$i ON u.user_id = s$i.user_id").mkString("\n")}"""
      .stripMargin
  }
}
