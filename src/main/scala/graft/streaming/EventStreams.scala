package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming analytics over event streams — the streaming
  * halves of [[graft.operators.Events]]:
  *
  *  - [[windowedCounts]]: event-time tumbling-window aggregation with a
  *    watermark. The watermark bounds state (windows older than the
  *    watermark are finalized and evicted), which is what makes an
  *    unbounded stream aggregable on a fixed-memory cluster; the shuffle
  *    is |windows × types| after partial aggregation, same as batch.
  *  - [[sessionize]]: gap-based sessionization via
  *    `flatMapGroupsWithState` — genuinely stateful per-key logic that
  *    windowed aggs can't express (a session's end depends on the NEXT
  *    event's time). State per user is one open session (constant size);
  *    `EventTimeTimeout` + the watermark close idle sessions and evict
  *    their state, so state never grows with stream length — the 100 TB
  *    concern for any stateful operator.
  *
  * Both are spec-checked against their batch formulations
  * (`qEventsWindow` / `qSessionize`) on the same data — the agreement
  * proof the reference's split batch/stream systems can't give you.
  */
// Serializable: the stateful folds' closures reference the object's
// micro-precision timestamp helpers, so the object rides along to tasks
object EventStreams extends Serializable {

  final case class Event(event_id: Long, ts: Timestamp, user_id: Long,
                         event_type: String, value: Double)

  final case class SessionState(start: Long, end: Long, n: Long)

  final case class Session(user_id: Long, session_start: Timestamp,
                           session_end: Timestamp, n_events: Long)

  /** Tumbling 1-hour counts per event_type with a 2-hour watermark.
    * Append mode emits each window once, when the watermark passes it —
    * the semantics that match the batch groupBy exactly on a bounded
    * replay. */
  def windowedCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("w.start").as("ws"), col("event_type"), col("n_events"))

  /** Streaming exact dedup — the ingestion guard of every training-data
    * pipeline (re-delivered files, at-least-once sources):
    * `dropDuplicatesWithinWatermark` keys state by event_id and EVICTS
    * each key once the watermark passes its event time + delay — state
    * is bounded by the watermark window, where plain streaming
    * `dropDuplicates` grows keys forever (the 100 TB failure mode). */
  def dedupEvents(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .dropDuplicatesWithinWatermark("event_id")

  /** Stream-stream proximity join — the streaming counterpart of
    * [[graft.operators.RangeJoin]]: error events joined to the same
    * user's click events within ± 1 hour, as two watermarked streams.
    *
    * Spark's stream-stream join REQUIRES the event-time bound in the
    * join condition — it is what lets each side evict buffered state
    * once the other side's watermark passes `t ± tolerance`, keeping
    * state proportional to the tolerance window, not the stream. This
    * is the built-in, state-bounded form of the same bucketing idea the
    * batch RangeJoin uses. */
  def proximityJoin(errors: DataFrame, clicks: DataFrame): DataFrame = {
    val e = errors.withWatermark("ts", "2 hours")
      .select(col("user_id"), col("event_id"), col("ts"))
    val c = clicks.withWatermark("cts", "2 hours")
      .select(col("user_id").as("cuser"), col("event_id").as("click_id"),
        col("cts"))
    e.join(c,
      col("user_id") === col("cuser") &&
        col("cts") >= col("ts") - expr("INTERVAL 1 HOUR") &&
        col("cts") <= col("ts") + expr("INTERVAL 1 HOUR"))
      .select(col("user_id"), col("event_id"), col("click_id"),
        (unix_micros(col("ts")) - unix_micros(col("cts"))).as("dt_us"))
  }

  // java.sql.Timestamp.getTime is millisecond-resolution; event time is
  // microseconds. Round-trip through micros-since-epoch exactly, or
  // stateful operators disagree with their batch formulations in the
  // sub-ms digits.
  private def toMicros(t: Timestamp): Long =
    t.getTime * 1000 + (t.getNanos % 1000000) / 1000
  private def toTimestamp(us: Long): Timestamp = {
    val t = new Timestamp(us / 1000)
    t.setNanos((us % 1000000).toInt * 1000)
    t
  }

  /** Gap-based sessions (gap = [[graft.operators.Events.sessionGapMicros]]).
    * Within a micro-batch, a user's events arrive as an unordered
    * iterator — they are sorted by event time here, then folded into the
    * open session carried in `GroupState`. A session is emitted when a
    * gap closes it or its event-time timeout fires (watermark passed
    * start + gap). */
  def sessionize(events: Dataset[Event]): Dataset[Session] = {
    import events.sparkSession.implicits._
    val gap = graft.operators.Events.sessionGapMicros

    def fold(userId: Long, it: Iterator[Event],
             state: GroupState[SessionState]): Iterator[Session] = {
      def toSession(s: SessionState) = Session(userId,
        toTimestamp(s.start), toTimestamp(s.end), s.n)
      if (state.hasTimedOut) {
        val out = state.getOption.map(toSession).iterator
        state.remove()
        out
      } else {
        val sorted = it.toSeq.sortBy(e => (toMicros(e.ts), e.event_id))
        var open = state.getOption
        val closed = Seq.newBuilder[Session]
        sorted.foreach { e =>
          val us = toMicros(e.ts)
          open match {
            case Some(s) if us - s.end <= gap =>
              open = Some(SessionState(s.start, us, s.n + 1))
            case Some(s) =>
              closed += toSession(s)
              open = Some(SessionState(us, us, 1))
            case None =>
              open = Some(SessionState(us, us, 1))
          }
        }
        open.foreach { s =>
          state.update(s)
          // close the session once the watermark passes its end + gap
          state.setTimeoutTimestamp(s.end / 1000 + gap / 1000)
        }
        closed.result().iterator
      }
    }

    events
      .withWatermark("ts", "2 hours")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(fold)
  }

  /** The shared disorder-handling bookkeeping of [[funnelStream]] and
    * [[transitionStream]] — ONE home for the invariant so a fix to the
    * late-drop boundary or finalization rule can never land in one
    * stream and not the other: absorb arrivals newer than the folded
    * boundary (beyond-watermark lates and checkpoint-replayed rows
    * drop here), dedup by event_id, split at the watermark, and return
    * (finalized events in exact event-time order, still-pending
    * buffer, new folded boundary). */
  private def finalizeArrivals(
      prevPending: Seq[(Long, Long, String, Double)], prevFoldedUpTo: Long,
      it: Iterator[Event], keep: String => Boolean, wmUs: Long)
      : (Seq[(Long, Long, String, Double)],
         Seq[(Long, Long, String, Double)], Long) = {
    val arrived = it.toSeq
      .filter(e => keep(e.event_type))
      .map(e => (toMicros(e.ts), e.event_id, e.event_type, e.value))
      .filter(_._1 > prevFoldedUpTo)
    val pending = (prevPending ++ arrived).distinctBy(_._2)
    val (ready, hold) = pending.partition(_._1 <= wmUs)
    (ready.sortBy(t => (t._1, t._2)), hold,
      math.max(prevFoldedUpTo, wmUs))
  }

  /** One funnel-step completion: user advanced to `step`
    * (1-based index into [[graft.operators.Events.funnelSteps]]) at
    * event time `ts`. The append-only streaming view of
    * [[graft.operators.Events.funnel]]: the batch operator's matched
    * (user, step, tᵢ) set IS the union of these records. */
  final case class FunnelStep(user_id: Long, step: Int, step_name: String,
                              ts: Timestamp)

  /** Per-user funnel state: progress so far plus the not-yet-finalized
    * event buffer. `foldedUpTo` marks the immutable region — events at
    * or before it have been folded in exact event-time order and their
    * verdicts emitted; `pending` holds (tsUs, event_id, type) newer
    * than it, bounded by the watermark delay × per-user event rate. */
  final case class FunnelBuf(depth: Int, lastTs: Long, foldedUpTo: Long,
                             pending: Seq[(Long, Long, String, Double)])

  /** STREAMING FUNNEL — [[graft.operators.Events.funnel]]'s greedy
    * earliest-match fold as a stateful stream, EXACT on the
    * watermark-finalized region even under out-of-order arrival:
    * arriving funnel-typed events buffer in per-user state; each batch
    * folds ONLY the prefix the watermark has finalized (`ts ≤
    * watermark`), in full event-time order — so an event that arrives
    * a batch "too early" waits until every possibly-preceding event is
    * in, and the fold replays the batch semantics verbatim. Step
    * completions are emitted as append-only records the moment their
    * fold happens; the streamed completion set equals the batch
    * operator's matched steps restricted to `tᵢ ≤ final watermark`
    * (EventStreamsSpec proves it, including a cross-batch disorder
    * case).
    *
    * State bounds (the 100 TB question for any stateful op): `pending`
    * holds at most the watermark window's worth of one user's
    * funnel-typed events; the folded region is CONSTANT size (depth +
    * last matched time). Events at or before `foldedUpTo` on arrival
    * are beyond-watermark lates — dropped, the standard watermarked
    * contract (and exactly what a replayed checkpoint batch delivers,
    * making redelivery a no-op). An event-time timeout re-fires the
    * fold when the watermark advances past buffered events with no new
    * arrivals for the user. */
  def funnelStream(events: Dataset[Event]): Dataset[FunnelStep] = {
    import events.sparkSession.implicits._
    val steps = graft.operators.Events.funnelSteps

    def fold(userId: Long, it: Iterator[Event],
             state: GroupState[FunnelBuf]): Iterator[FunnelStep] = {
      val wmUs = state.getCurrentWatermarkMs() * 1000
      val prev = state.getOption
        .getOrElse(FunnelBuf(0, Long.MinValue, Long.MinValue, Nil))
      val (ready, hold, foldedUpTo) = finalizeArrivals(
        prev.pending, prev.foldedUpTo, it, steps.contains, wmUs)
      var depth = prev.depth
      var lastTs = prev.lastTs
      val out = Seq.newBuilder[FunnelStep]
      ready.foreach { case (ts, _, tpe, _) =>
        if (depth < steps.size && tpe == steps(depth) && ts > lastTs) {
          depth += 1
          lastTs = ts
          out += FunnelStep(userId, depth, tpe, toTimestamp(ts))
        }
      }
      state.update(FunnelBuf(depth, lastTs, foldedUpTo, hold))
      if (hold.nonEmpty) // re-fold when the watermark moves again
        state.setTimeoutTimestamp(state.getCurrentWatermarkMs() + 1)
      out.result().iterator
    }

    events
      .withWatermark("ts", "2 hours")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(fold)
  }

  /** STREAMING ANOMALY MONITOR — the deployment composition the hourly
    * baseline exists for: [[windowedCounts]]'s watermark-finalized
    * (hour, type) rollup appends to a parquet store (exactly-once via
    * the sink's checkpointed commit log), and [[anomalyView]] applies
    * [[graft.operators.Events.anomalyOver]]'s trailing-24h scoring
    * over the store. The view equals the batch q_event_anomaly
    * restricted to finalized hours — for any stored hour, every
    * earlier hour of its baseline window was finalized first (window
    * ends are monotone), so the baseline is complete by construction.
    * Cost: the view scans |hours × types| rollup rows, NEVER events —
    * a monitoring dashboard refreshes it per batch for free. */
  def runHourlyCountStream(spark: SparkSession, events: DataFrame,
                           storePath: String, checkpointDir: String)
      : org.apache.spark.sql.streaming.StreamingQuery =
    windowedCounts(events)
      .writeStream.format("parquet")
      .option("path", storePath)
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()

  def anomalyView(spark: SparkSession, storePath: String): DataFrame =
    graft.operators.Events.anomalyOver(
      spark.read.parquet(storePath)
        .select(col("event_type"), col("ws").as("hour"),
          col("n_events").as("n")))

  /** STREAMING MIX-DRIFT VIEW — [[graft.operators.MixDrift]]'s G-test
    * served from the hourly count store: the store's day rollup IS the
    * contingency table, so the view runs `mixDriftCells` — the one
    * shared definition — over |days × types| rows, never events. Only
    * COMPLETE days score (days strictly before the last stored hour's
    * day): window ends are monotone and every finalized hour up to the
    * max is stored, so every earlier day's cells are final; the
    * in-flight day would otherwise score a partial (wrong) mix rather
    * than a missing row — aggregation over time buckets makes "late"
    * mean "corrupt", not "absent", hence the explicit cut. */
  def mixDriftView(spark: SparkSession, storePath: String): DataFrame = {
    val store = spark.read.parquet(storePath)
    val maxWs = store.agg(max(col("ws"))).head.getTimestamp(0)
    val dayCut = date_trunc("DAY", lit(maxWs))
    graft.operators.MixDrift.mixDriftCells(
      store.filter(col("ws") < dayCut)
        .groupBy(date_trunc("DAY", col("ws")).as("period"),
          col("event_type").as("cat"))
        .agg(sum(col("n_events")).as("o")))
  }

  /** STREAMING ACF VIEW — [[graft.operators.Autocorr]]'s 24-lag
    * autocorrelation served from the hourly count store: the store's
    * cross-type hour rollup IS the series, so the view runs `acf` —
    * the one shared definition — over |hours| rows, never events.
    * Like [[mixDriftView]], the statistic is a lazy view: per-batch
    * refresh cost is the store scan plus the bounded spine window.
    * Equal to the batch [[graft.operators.Autocorr.qAcf]] on the
    * absorbed corpus once all hours are watermark-finalized
    * (spec-proven). */
  def acfView(spark: SparkSession, storePath: String): DataFrame =
    graft.operators.Autocorr.acf(
      spark.read.parquet(storePath)
        .groupBy(expr("unix_micros(ws) div 3600000000").as("h"))
        .agg(sum(col("n_events")).as("c")))

  /** STREAMING CROSS-CORRELATION VIEW —
    * [[graft.operators.TimeSeriesPair]]'s lagged CCF served from the
    * hourly count store via the shared `pairSpineOverHourly`
    * definition: the (type, hour) rollup IS the two series, so the
    * spine, lag windows and per-lag Pearson sums ride |hours| rows,
    * never events. Equal to the batch q_xcorr on the absorbed corpus
    * once all hours are watermark-finalized (spec-proven). */
  def xcorrView(spark: SparkSession, storePath: String): DataFrame =
    graft.operators.TimeSeriesPair.xcorr(hourlyPairSpine(spark, storePath))

  /** STREAMING GRANGER VIEW — the predictive F test served from the
    * same spine; 1-row refresh cost per dashboard read. */
  def grangerView(spark: SparkSession, storePath: String): DataFrame =
    graft.operators.TimeSeriesPair.granger(
      hourlyPairSpine(spark, storePath))

  private def hourlyPairSpine(spark: SparkSession,
                              storePath: String): DataFrame =
    graft.operators.TimeSeriesPair.pairSpineOverHourly(
      spark.read.parquet(storePath)
        .select(col("event_type"),
          expr("unix_micros(ws) div 3600000000").as("h"),
          col("n_events").as("n")))

  /** STREAMING FANO VIEW — [[graft.operators.EventDynamics]]'s
    * dispersion leg served from the hourly count store via the shared
    * `fanoOverHourly` definition (the span counts hour BUCKETS, so
    * the rollup is sufficient). The inter-arrival burstiness leg
    * needs per-user gaps and stays batch-only — stated, not hidden. */
  def fanoView(spark: SparkSession, storePath: String): DataFrame =
    graft.operators.EventDynamics.fanoOverHourly(
      spark.read.parquet(storePath)
        .select(col("event_type"),
          expr("unix_micros(ws) div 3600000000").as("hour"),
          col("n_events").as("c")))

  /** STREAMING EWMA VIEW — [[graft.operators.Ewma]]'s level monitor
    * served from the hourly count store via the shared `ewmaOver`
    * definition; the lag window rides the stored |types×hours| rollup,
    * never events. */
  def ewmaView(spark: SparkSession, storePath: String): DataFrame =
    graft.operators.Ewma.ewmaOver(
      spark.read.parquet(storePath)
        .select(col("event_type"), col("ws").as("hour"),
          col("n_events").as("n")))

  /** STREAMING BROWN DOUBLE-EWMA VIEW — [[graft.operators.Forecast]]'s
    * trend-aware forecaster served from the hourly count store via the
    * shared `doubleEwmaOver` definition (the [[ewmaView]] pattern with
    * the 15-tap self-convolved kernel). */
  def doubleEwmaView(spark: SparkSession, storePath: String): DataFrame =
    graft.operators.Forecast.doubleEwmaOver(
      spark.read.parquet(storePath)
        .select(col("event_type"), col("ws").as("hour"),
          col("n_events").as("n")))

  /** STREAMING FORECAST-EVAL VIEW — [[graft.operators.Forecast]]'s
    * MASE/sMAPE readout served from the hourly count store via the
    * shared `forecastEvalOver` definition. */
  def forecastEvalView(spark: SparkSession, storePath: String): DataFrame =
    graft.operators.Forecast.forecastEvalOver(
      spark.read.parquet(storePath)
        .select(col("event_type"), col("ws").as("hour"),
          col("n_events").as("n")))

  /** STREAMING ADF VIEW — [[graft.operators.AdfTest]]'s unit-root
    * test served from the hourly count store via the shared
    * `adfOverHourly` definition. */
  def adfView(spark: SparkSession, storePath: String): DataFrame =
    graft.operators.AdfTest.adfOverHourly(
      spark.read.parquet(storePath)
        .select(col("event_type"), col("ws").as("hour"),
          col("n_events").as("n")))

  /** STREAMING EXTREME-VALUE VIEW — [[graft.operators.ExtremeValue]]'s
    * Gumbel return levels served from the hourly count store via the
    * shared `extremeOverHourly` definition. */
  def extremeView(spark: SparkSession, storePath: String): DataFrame =
    graft.operators.ExtremeValue.extremeOverHourly(
      spark.read.parquet(storePath)
        .select(col("event_type"), col("ws").as("hour"),
          col("n_events").as("n")))

  /** STREAMING RUNS-TEST VIEW — [[graft.operators.RunsTest]]'s
    * randomness check served from the hourly count store via the
    * shared `runsTestOverHourly` definition. */
  def runsTestView(spark: SparkSession, storePath: String): DataFrame =
    graft.operators.RunsTest.runsTestOverHourly(
      spark.read.parquet(storePath)
        .select(col("event_type"), col("ws").as("hour"),
          col("n_events").as("n")))

  /** STREAMING SEASONAL-DECOMPOSITION VIEW — [[graft.operators
    * .StlDecompose]]'s classical additive decomposition served from
    * the hourly count store via the shared `stlOverHourly`
    * definition. */
  def stlView(spark: SparkSession, storePath: String): DataFrame =
    graft.operators.StlDecompose.stlOverHourly(
      spark.read.parquet(storePath)
        .select(col("event_type"), col("ws").as("hour"),
          col("n_events").as("n")))

  /** STREAMING TREND VIEW — [[graft.operators.Trend]]'s per-type OLS
    * served from the hourly count store via the shared
    * `trendOverHourly` definition: the store rollup IS the regression
    * input, so the dense spine + five sufficient statistics ride
    * |types×hours| rows, never events. Equal to the batch
    * [[graft.operators.Trend.qTrend]] on the absorbed corpus once all
    * hours are watermark-finalized (spec-proven). */
  def trendView(spark: SparkSession, storePath: String): DataFrame =
    graft.operators.Trend.trendOverHourly(
      spark.read.parquet(storePath)
        .select(col("event_type"), col("ws").as("hour"),
          col("n_events").as("y")))

  /** STREAMING SEASONALITY VIEW — [[graft.operators.Seasonality]]'s
    * hour-of-day ANOVA η² served from the hourly count store via the
    * shared `seasonalityOverHourly` definition: the spine + the
    * |types×24| group aggregate ride |types×hours| rollup rows, never
    * events. Equal to the batch
    * [[graft.operators.Seasonality.qSeasonality]] on the absorbed
    * corpus once all hours are watermark-finalized (spec-proven). */
  def seasonalityView(spark: SparkSession, storePath: String): DataFrame =
    graft.operators.Seasonality.seasonalityOverHourly(
      spark.read.parquet(storePath)
        .select(col("event_type"), col("ws").as("hour"),
          col("n_events").as("n")))

  /** STREAMING CHANGEPOINT VIEW — [[graft.operators.Changepoint]]'s
    * AMOC localization served from the hourly count store via the
    * shared `changepointOverHourly` definition: the cumsum window and
    * struct-max argmax ride |types×hours| rollup rows, never events.
    * Equal to the batch [[graft.operators.Changepoint.qChangepoint]]
    * on the absorbed corpus once all hours are watermark-finalized
    * (spec-proven). */
  def changepointView(spark: SparkSession, storePath: String): DataFrame =
    graft.operators.Changepoint.changepointOverHourly(
      spark.read.parquet(storePath)
        .select(col("event_type"), col("ws").as("hour"),
          col("n_events").as("y")))

  /** STREAMING SESSION STORE — [[sessionize]]'s watermark-finalized
    * sessions appended to a parquet store (exactly-once via the file
    * sink's checkpointed commit log): the [[runHourlyCountStream]]
    * deployment pattern applied to the stateful sessionizer. The store
    * IS the batch session table restricted to the finalized region
    * (EventStreamsSpec proves both directions), so every downstream
    * batch operator over sessions — concurrency, duration rollups —
    * runs unchanged against it. */
  def runSessionStream(spark: SparkSession, events: Dataset[Event],
                       storePath: String, checkpointDir: String)
      : org.apache.spark.sql.streaming.StreamingQuery =
    sessionize(events)
      .writeStream.format("parquet")
      .option("path", storePath)
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()

  /** LIVE CONCURRENCY VIEW over the session store — the capacity
    * dashboard query: [[graft.operators.Concurrency.peakConcurrency]]
    * (boundary events + scalable prefix sum) applied to the streamed
    * sessions. Refresh cost is the |sessions|-row store scan, never
    * event volume; on finalized days the view equals the batch
    * q_concurrency by the store-equivalence argument above. */
  def concurrencyView(spark: SparkSession, storePath: String): DataFrame =
    graft.operators.Concurrency.peakConcurrency(
      spark.read.parquet(storePath))

  /** One consecutive-pair observation for the transition matrix. */
  final case class Transition(user_id: Long, from_type: String,
                              to_type: String, ts: Timestamp)

  /** Per-user transition state: the last FINALIZED event (the `lag`
    * value), the finalized boundary, and the watermark-bounded pending
    * buffer — [[funnelStream]]'s disorder posture applied to
    * [[graft.operators.Events.qEventTransitions]]. */
  final case class TransBuf(last: Option[(Long, Long, String, Double)],
                            foldedUpTo: Long,
                            pending: Seq[(Long, Long, String, Double)])

  /** STREAMING TRANSITION MATRIX feed — append-only (from, to) pair
    * records whose corpus-wide count IS the batch
    * [[graft.operators.Events.qEventTransitions]] matrix over the
    * finalized region. Correctness under disorder is the same argument
    * as [[funnelStream]]: a pair (eᵢ → eᵢ₊₁) is emitted only when
    * eᵢ₊₁.ts ≤ watermark, and any future arrival has ts > watermark ≥
    * eᵢ₊₁.ts — nothing can ever land between a finalized pair. State
    * per user: one last-event triple plus the watermark window of
    * pending events. */
  def transitionStream(events: Dataset[Event]): Dataset[Transition] = {
    import events.sparkSession.implicits._

    def fold(userId: Long, it: Iterator[Event],
             state: GroupState[TransBuf]): Iterator[Transition] = {
      val wmUs = state.getCurrentWatermarkMs() * 1000
      val prev = state.getOption.getOrElse(TransBuf(None, Long.MinValue, Nil))
      val (ready, hold, foldedUpTo) = finalizeArrivals(
        prev.pending, prev.foldedUpTo, it, _ => true, wmUs)
      var last = prev.last
      val out = Seq.newBuilder[Transition]
      ready.foreach { e =>
        last.foreach(l =>
          out += Transition(userId, l._3, e._3, toTimestamp(e._1)))
        last = Some(e)
      }
      state.update(TransBuf(last, foldedUpTo, hold))
      if (hold.nonEmpty)
        state.setTimeoutTimestamp(state.getCurrentWatermarkMs() + 1)
      out.result().iterator
    }

    events
      .withWatermark("ts", "2 hours")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(fold)
  }

  /** One attributed (or unattributed) purchase — the streaming record
    * matching a row of [[graft.operators.Events.attribution]]. */
  final case class Attribution(event_id: Long, user_id: Long,
                               ts: Timestamp, value: Double,
                               click_ts: Option[Timestamp],
                               attributed: Int)

  /** Per-user attribution state: the last FINALIZED click time (the
    * running `last(when(click, ts))` value), the finalized boundary,
    * and the watermark-bounded pending buffer. */
  final case class AttrBuf(lastClick: Long, foldedUpTo: Long,
                           pending: Seq[(Long, Long, String, Double)])

  /** STREAMING LAST-TOUCH ATTRIBUTION — the stateful form of
    * [[graft.operators.Events.attribution]], and the semantics a bare
    * stream-stream interval join ([[proximityJoin]]) canNOT give: the
    * join emits EVERY click within the window, last-touch needs only
    * the latest preceding one, which is an order-dependent fold. Same
    * disorder contract as [[funnelStream]]: events finalize in exact
    * (ts, event_id) order once the watermark passes them, so the
    * carried last-click value sees clicks and purchases in the batch
    * window's exact frame order — an equal-timestamp click with a
    * smaller event_id lands before its purchase, matching the batch
    * `ROWS … 1 PRECEDING` frame. Emitted records equal the batch
    * operator's rows restricted to the finalized region
    * (EventStreamsSpec proves both directions).
    *
    * State per user: ONE long (last click) + the watermark window of
    * pending click/purchase events — the sessionizer's bound. */
  def attributionStream(events: Dataset[Event]): Dataset[Attribution] = {
    import events.sparkSession.implicits._
    val windowUs = graft.operators.Events.attributionWindowMicros

    def fold(userId: Long, it: Iterator[Event],
             state: GroupState[AttrBuf]): Iterator[Attribution] = {
      val wmUs = state.getCurrentWatermarkMs() * 1000
      val prev = state.getOption
        .getOrElse(AttrBuf(Long.MinValue, Long.MinValue, Nil))
      val (ready, hold, foldedUpTo) = finalizeArrivals(
        prev.pending, prev.foldedUpTo, it,
        t => t == "click" || t == "purchase", wmUs)
      var lastClick = prev.lastClick
      val out = Seq.newBuilder[Attribution]
      ready.foreach { case (ts, id, tpe, v) =>
        if (tpe == "click") lastClick = ts
        else {
          val ok = lastClick != Long.MinValue && ts - lastClick <= windowUs
          out += Attribution(id, userId, toTimestamp(ts), v,
            if (ok) Some(toTimestamp(lastClick)) else None,
            if (ok) 1 else 0)
        }
      }
      state.update(AttrBuf(lastClick, foldedUpTo, hold))
      if (hold.nonEmpty)
        state.setTimeoutTimestamp(state.getCurrentWatermarkMs() + 1)
      out.result().iterator
    }

    events
      .withWatermark("ts", "2 hours")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(fold)
  }
}
