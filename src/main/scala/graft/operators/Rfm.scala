package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** RFM SEGMENTATION (Hughes 1994 — the recency/frequency/monetary
  * grid every CRM and lifecycle-marketing stack runs): quintile each
  * user on
  *
  *   R — days since last activity (1 = most recent),
  *   F — purchase count (1 = most frequent),
  *   M — purchase cents (1 = highest spend),
  *
  * and roll the corpus up to the populated (r, f, m) cells with their
  * population and spend — the segment table behind "champions /
  * at-risk / hibernating" playbooks.
  *
  * DETERMINISM. All three metrics are exact integers off one events
  * scan (recency against the corpus max timestamp — a 1-row
  * broadcast); quintiles use the exact ntile identity
  * (rn−1)·5 div n + 1 over [[RowNumbering]]'s scalable global row
  * number with user_id tiebreaks (the [[graft.ext.CorpusOps
  * .qCalibration]] precedent, cross-validated against native ntile by
  * that oracle); the rollup is integer counts/sums with one mirrored
  * division.
  *
  * SCALE. One scan → per-user table; three two-level row numbers
  * (never a single-partition window); ≤125-row output. */
object Rfm {

  private val usPerDay = 86400000000L

  def rfm(events: DataFrame): DataFrame =
    rfmFromPerUser(events.groupBy("user_id").agg(
      max(unix_micros(col("ts"))).as("last_us"),
      sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
        .as("freq"),
      sum(when(col("event_type") === "purchase",
        expr("cast(round(value * 100.0) as bigint)")).otherwise(0L))
        .as("mon")))

  /** The segment table from any (user_id, last_us, freq, mon)
    * per-user frame (streaming-store entry — last_us is a MAX lattice,
    * freq/mon per-user sums, so
    * [[graft.streaming.ExperimentStore.rfmView]] equals this). */
  def rfmFromPerUser(pu: DataFrame): DataFrame = {
    val mx = pu.agg(max("last_us").as("corpus_us"))
    val base = pu.crossJoin(broadcast(mx))
      .selectExpr("user_id", "freq", "mon",
        s"(corpus_us - last_us) div $usPerDay as rec_days")
    val n = base.count()
    def quint(sort: Seq[org.apache.spark.sql.Column],
              name: String): DataFrame =
      RowNumbering.withGlobalRowNumber(base, sort :+ col("user_id").asc,
          "rn")
        .selectExpr("user_id", s"(rn - 1) * 5 div ${math.max(n, 1L)} + 1"
          + s" as $name")
    val r = quint(Seq(col("rec_days").asc), "r_q") // recent = best
    val f = quint(Seq(col("freq").desc), "f_q")
    val m = quint(Seq(col("mon").desc), "m_q")
    base.join(r, "user_id").join(f, "user_id").join(m, "user_id")
      .groupBy("r_q", "f_q", "m_q")
      .agg(count(lit(1)).as("n_users"), sum("mon").as("sum_cents"))
      .selectExpr("r_q", "f_q", "m_q", "n_users", "sum_cents",
        """cast(round(1000000.0 * sum_cents / n_users) as bigint)
          | as avg_cents_micro""".stripMargin.replace("\n", " "))
  }

  def qRfm(spark: SparkSession, dir: String): DataFrame =
    rfm(Tables(spark, dir, "events"))

  val qRfmSql: String =
    s"""WITH pu AS MATERIALIZED (
       |  SELECT user_id, MAX(epoch_us(ts)) AS last_us,
       |    SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
       |      AS freq,
       |    SUM(CASE WHEN event_type = 'purchase'
       |        THEN CAST(ROUND(value * 100.0) AS BIGINT) ELSE 0 END)
       |      AS mon
       |  FROM events GROUP BY user_id),
       |base AS MATERIALIZED (
       |  SELECT user_id, freq, mon,
       |    ((SELECT MAX(last_us) FROM pu) - last_us) // $usPerDay
       |      AS rec_days
       |  FROM pu),
       |nn AS (SELECT COUNT(*) AS n FROM base),
       |q AS (
       |  SELECT user_id, freq, mon,
       |    (row_number() OVER (ORDER BY rec_days ASC, user_id ASC) - 1)
       |      * 5 // nn.n + 1 AS r_q,
       |    (row_number() OVER (ORDER BY freq DESC, user_id ASC) - 1)
       |      * 5 // nn.n + 1 AS f_q,
       |    (row_number() OVER (ORDER BY mon DESC, user_id ASC) - 1)
       |      * 5 // nn.n + 1 AS m_q
       |  FROM base, nn)
       |SELECT CAST(r_q AS BIGINT) AS r_q, CAST(f_q AS BIGINT) AS f_q,
       |  CAST(m_q AS BIGINT) AS m_q,
       |  CAST(COUNT(*) AS BIGINT) AS n_users,
       |  CAST(SUM(mon) AS BIGINT) AS sum_cents,
       |  CAST(ROUND(1000000.0 * SUM(mon) / COUNT(*)) AS BIGINT)
       |    AS avg_cents_micro
       |FROM q GROUP BY 1, 2, 3""".stripMargin
}
