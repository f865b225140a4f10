package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** MARKOV NEXT-EVENT PREDICTION EVAL — the train → serve → score loop
  * over [[Events.qEventTransitions]]' first-order model, done the way
  * a sequence-model baseline is actually validated: fit the transition
  * argmax on the PRE-split half of the event clock, predict the next
  * event type on the POST-split half, and report top-1 accuracy
  * against the majority-class baseline (a Markov model only has skill
  * if it beats "always predict the most common event"). This is the
  * temporal-holdout twin of the classifier's train/eval pair, on the
  * path-analytics family.
  *
  * Split: a transition belongs to the half its TO-event's timestamp
  * falls in ([[DiffInDiff.splitDate]], the repo's event-clock cut) —
  * so no training pair peeks at eval time.
  *
  * DETERMINISM. The model is argmax-by-count with ties broken by
  * to_type ascending (a rank-1 window over the ≤|types|² count
  * table); accuracy is exact integers with two mirrored divisions.
  *
  * SCALE. The lag window is the sessionizer's one per-user exchange;
  * both model fit and eval collapse to |types|²-bounded tables before
  * anything else happens. */
object MarkovEval {

  /** The (is_train, from_type, to_type, n) transition-count table —
    * the |types|²-bounded sufficient statistic everything below
    * consumes (and the per-key SUM monoid the streaming
    * [[graft.streaming.MarkovStore]] maintains). */
  def transitionCounts(events: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val split = lit(DiffInDiff.splitDate).cast("timestamp")
    events
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("from_type", lag(col("event_type"), 1).over(w))
      .filter(col("from_type").isNotNull)
      .select(col("from_type"), col("event_type").as("to_type"),
        (col("ts") < split).as("is_train"))
      .groupBy("is_train", "from_type", "to_type")
      .agg(count(lit(1)).as("n"))
  }

  def markovEval(events: DataFrame): DataFrame =
    markovFromCounts(transitionCounts(events))

  /** The train → serve → score readout from any (is_train, from_type,
    * to_type, n) count table ([[transitionCounts]]'s shape;
    * streaming-store entry). */
  def markovFromCounts(counts: DataFrame): DataFrame = {
    val trainCounts = counts.filter(col("is_train")).drop("is_train")
    // model: per from_type, the count-argmax to_type (ties: to_type asc)
    val model = trainCounts
      .withColumn("rk", row_number().over(Window.partitionBy("from_type")
        .orderBy(col("n").desc, col("to_type").asc)))
      .filter(col("rk") === 1)
      .select(col("from_type"), col("to_type").as("pred"))
    // baseline: the overall majority to_type of the training half
    val base = trainCounts.groupBy("to_type").agg(sum("n").as("n"))
      .orderBy(col("n").desc, col("to_type").asc).limit(1)
      .select(col("to_type").as("base_pred"))
    val evalCounts = counts.filter(!col("is_train")).drop("is_train")
    evalCounts
      .join(broadcast(model), Seq("from_type"), "left")
      .crossJoin(broadcast(base))
      .agg(
        sum("n").as("n_eval"),
        sum(when(col("pred") === col("to_type"), col("n")).otherwise(0L))
          .as("n_correct"),
        sum(when(col("base_pred") === col("to_type"), col("n"))
          .otherwise(0L)).as("n_base_correct"))
      .crossJoin(broadcast(
        trainCounts.agg(sum("n").as("n_train"))))
      .selectExpr("n_train", "n_eval", "n_correct", "n_base_correct",
        """case when n_eval = 0 then 0L else
          | cast(round(1000000.0 * n_correct / n_eval) as bigint) end
          | as acc_micro""".stripMargin.replace("\n", " "),
        """case when n_eval = 0 then 0L else
          | cast(round(1000000.0 * n_base_correct / n_eval) as bigint)
          | end as baseline_micro""".stripMargin.replace("\n", " "))
      .withColumn("has_skill", col("acc_micro") > col("baseline_micro"))
  }

  def qMarkovEval(spark: SparkSession, dir: String): DataFrame =
    markovEval(Tables(spark, dir, "events"))

  val qMarkovEvalSql: String =
    s"""WITH pairs AS MATERIALIZED (
       |  SELECT from_type, event_type AS to_type,
       |    ts < TIMESTAMP '${DiffInDiff.splitDate}' AS is_train
       |  FROM (
       |    SELECT user_id, ts, event_type,
       |      lag(event_type) OVER (
       |        PARTITION BY user_id ORDER BY ts, event_id) AS from_type
       |    FROM events)
       |  WHERE from_type IS NOT NULL),
       |counts AS MATERIALIZED (
       |  SELECT is_train, from_type, to_type,
       |    CAST(COUNT(*) AS BIGINT) AS n
       |  FROM pairs GROUP BY 1, 2, 3),
       |model AS (
       |  SELECT from_type, to_type AS pred FROM (
       |    SELECT from_type, to_type,
       |      row_number() OVER (PARTITION BY from_type
       |        ORDER BY n DESC, to_type ASC) AS rk
       |    FROM counts WHERE is_train)
       |  WHERE rk = 1),
       |base AS (
       |  SELECT to_type AS base_pred FROM (
       |    SELECT to_type, SUM(n) AS n FROM counts WHERE is_train
       |    GROUP BY 1 ORDER BY n DESC, to_type ASC LIMIT 1)),
       |ev AS (
       |  SELECT SUM(c.n) AS n_eval,
       |    SUM(CASE WHEN m.pred = c.to_type THEN c.n ELSE 0 END)
       |      AS n_correct,
       |    SUM(CASE WHEN b.base_pred = c.to_type THEN c.n ELSE 0 END)
       |      AS n_base_correct
       |  FROM counts c LEFT JOIN model m USING (from_type), base b
       |  WHERE NOT c.is_train),
       |tr AS (SELECT SUM(n) AS n_train FROM counts WHERE is_train)
       |SELECT CAST(tr.n_train AS BIGINT) AS n_train,
       |  CAST(ev.n_eval AS BIGINT) AS n_eval,
       |  CAST(ev.n_correct AS BIGINT) AS n_correct,
       |  CAST(ev.n_base_correct AS BIGINT) AS n_base_correct,
       |  CASE WHEN ev.n_eval = 0 THEN 0 ELSE
       |    CAST(ROUND(1000000.0 * ev.n_correct / ev.n_eval) AS BIGINT) END
       |    AS acc_micro,
       |  CASE WHEN ev.n_eval = 0 THEN 0 ELSE
       |    CAST(ROUND(1000000.0 * ev.n_base_correct / ev.n_eval)
       |      AS BIGINT) END AS baseline_micro,
       |  CASE WHEN ev.n_eval = 0 THEN 0 ELSE
       |    CAST(ROUND(1000000.0 * ev.n_correct / ev.n_eval) AS BIGINT) END
       |    > CASE WHEN ev.n_eval = 0 THEN 0 ELSE
       |    CAST(ROUND(1000000.0 * ev.n_base_correct / ev.n_eval)
       |      AS BIGINT) END AS has_skill
       |FROM ev, tr""".stripMargin
}
