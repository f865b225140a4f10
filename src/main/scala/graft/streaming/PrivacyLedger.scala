package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.DpRelease

/** PRIVACY-BUDGET LEDGER — the accounting half of [[DpRelease]]: under
  * sequential composition every release SPENDS ε from a per-scope
  * budget, and a system that doesn't track the cumulative spend has no
  * privacy guarantee at all (ε adds up; the mechanism is only as good
  * as its ledger). The spend stream is a per-scope SUM monoid, so the
  * ledger is a [[MonoidStore]]: one (scope, eps_micro) delta dir per
  * release, replay-idempotent by the overwrite layout (re-running a
  * crashed release re-writes ITS OWN spend instead of double-charging
  * the budget).
  *
  * The ledger store is NOT compactable ([[MonoidStore.compactable]]
  * false): replay idempotence comes from excluding a replayed
  * release's OWN batch dir from the spend check, and folding dirs
  * into a `batch=-1` base would make an already-folded charge
  * unexcludable — the replay would then double-charge. Unlike
  * micro-batch stores, the dir count here grows with RELEASES (a
  * human-scale audit trail, not a stream cadence), so unbounded-dir
  * pressure never arises and refusing compaction costs nothing.
  *
  * [[release]] is the guarded entry point: it checks the scope's
  * remaining budget BEFORE computing anything, REFUSES (returns None,
  * writes nothing) when the release's cost would exceed it, and
  * otherwise records the spend and returns the released aggregates.
  * Refusal-before-compute is the contract auditors look for — a
  * budget check after the query ran has already spent the ε.
  * [[releaseAudit]] additionally surfaces the decision as a ROW
  * (scope, cost, spent-before, granted, spent-after) — refusals are
  * data for the audit trail, never exceptions — and
  * [[composedLedger]] is the declarative twin: the full grant/refuse
  * readout of a constant-cost release plan as one windowed query,
  * oracle-checkable and spec-proven ≡ the imperative store loop. */
object PrivacyLedger {

  def store(storePath: String): MonoidStore =
    new MonoidStore(storePath, MonoidStore.aggReduce(Seq("eps_micro")),
      compactable = false)

  /** Cumulative spend for one scope (0 when never charged). */
  def spent(spark: SparkSession, storePath: String, scope: String): Long = {
    if (!new java.io.File(storePath).exists) return 0L
    val r = store(storePath).merged(spark)
      .filter(col("scope") === scope)
      .agg(sum("eps_micro")).head()
    if (r.isNullAt(0)) 0L else r.getLong(0)
  }

  /** The full per-scope ledger. */
  def ledgerView(spark: SparkSession, storePath: String): DataFrame =
    store(storePath).merged(spark)

  /** One release decision, surfaced as data. */
  final case class Audit(releaseId: Long, scope: String, costMicro: Long,
                         spentBeforeMicro: Long, granted: Boolean,
                         spentAfterMicro: Long)

  /** Guarded DP release: charge `costMicro` against `scope`'s
    * `budgetMicro` under release id `releaseId` and return the
    * released frame — or refuse (None, nothing written, nothing
    * computed) when the remaining budget can't cover it. Re-running a
    * release id overwrites its own spend dir (idempotent charge). */
  def release(spark: SparkSession, dir: String, storePath: String,
              scope: String, releaseId: Long, budgetMicro: Long)
      : Option[DataFrame] =
    releaseAudit(spark, dir, storePath, scope, releaseId, budgetMicro)._2

  /** [[release]] plus the decision row — the form an audit pipeline
    * ingests: a refusal is a (granted = false) ROW in the trail, not
    * an exception, so downstream reporting sees every attempt. */
  def releaseAudit(spark: SparkSession, dir: String, storePath: String,
                   scope: String, releaseId: Long, budgetMicro: Long)
      : (Audit, Option[DataFrame]) = {
    import spark.implicits._
    val cost = DpRelease.epsCountMicro + DpRelease.epsSumMicro
    // a REPLAY of an already-charged release doesn't re-spend: its dir
    // will be overwritten, so exclude its own prior charge from the
    // remaining-budget check
    val already = spentExcluding(spark, storePath, scope, releaseId)
    if (already + cost > budgetMicro)
      (Audit(releaseId, scope, cost, already, granted = false, already),
        None)
    else {
      store(storePath).append(
        Seq((scope, cost)).toDF("scope", "eps_micro"), releaseId)
      (Audit(releaseId, scope, cost, already, granted = true,
        already + cost),
        Some(DpRelease.qDpCounts(spark, dir)))
    }
  }

  private def spentExcluding(spark: SparkSession, storePath: String,
                             scope: String, releaseId: Long): Long = {
    if (!new java.io.File(storePath).exists) return 0L
    val raw = spark.read.parquet(storePath)
    val others =
      if (raw.columns.contains("batch"))
        raw.filter(col("batch") =!= releaseId).drop("batch")
      else raw
    val r = store(storePath).reduce(others)
      .filter(col("scope") === scope).agg(sum("eps_micro")).head()
    if (r.isNullAt(0)) 0L else r.getLong(0)
  }

  /** Declarative composed-ε readout of a CONSTANT-COST release plan:
    * given (release_id, scope, cost_micro) with one cost per plan,
    * grant each release in release_id order while the scope's
    * cumulative spend stays within `budgetMicro`, refuse after. With
    * constant cost the refusals are exactly the suffix past
    * ⌊budget/cost⌋ grants, so the sequential fold collapses to one
    * per-scope cumulative-sum window — the spec proves this row-equal
    * to the imperative [[releaseAudit]] loop over the same plan.
    * Scale: one window over |releases| rows per scope — release plans
    * are human-scale audit trails, never corpus-sized. */
  def composedLedger(releases: DataFrame, budgetMicro: Long): DataFrame = {
    val w = Window.partitionBy("scope").orderBy("release_id")
    releases
      .withColumn("cum", sum(col("cost_micro")).over(w))
      // the spend cap a constant-cost scope can ever reach — exact
      // integer ⌊budget/cost⌋·cost (`div`), matching the oracle's `//`:
      // a rounded double quotient can cross an integer boundary for
      // near-integer ratios at large magnitudes
      .withColumn("cap",
        expr(s"${budgetMicro}L div cost_micro") * col("cost_micro"))
      .select(
        col("release_id"), col("scope"), col("cost_micro"),
        least(col("cum") - col("cost_micro"), col("cap"))
          .as("spent_before_micro"),
        (col("cum") <= budgetMicro).as("granted"),
        least(col("cum"), col("cap")).as("spent_after_micro"))
      .orderBy("release_id")
  }

  /** Per-scope budget for the driver plan: ε = 2.0 per region. Each
    * release costs [[DpRelease]]'s composed 0.5, so a region's 5
    * nation-level releases grant exactly 4 and refuse the 5th — the
    * boundary lands INSIDE the plan, which is what makes the query a
    * real refusal readout rather than an all-granted echo. */
  val regionBudgetMicro: Long = 2000000L

  /** Driver query: one planned release per nation (release_id =
    * n_nationkey order), scoped to its region, composed against
    * [[regionBudgetMicro]] — the ledger's grant/refuse audit trail. */
  def qPrivacyLedger(spark: SparkSession, dir: String): DataFrame = {
    val cost = DpRelease.epsCountMicro + DpRelease.epsSumMicro
    val plan = Tables(spark, dir, "nation")
      .join(broadcast(Tables(spark, dir, "region")),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey").cast("bigint").as("release_id"),
        col("r_name").as("scope"), lit(cost).as("cost_micro"))
    composedLedger(plan, regionBudgetMicro)
  }

  val qPrivacyLedgerSql: String = {
    val cost = DpRelease.epsCountMicro + DpRelease.epsSumMicro
    s"""WITH plan AS (
       |  SELECT CAST(n_nationkey AS BIGINT) AS release_id,
       |    r_name AS scope, CAST($cost AS BIGINT) AS cost_micro
       |  FROM nation JOIN region ON n_regionkey = r_regionkey),
       |cum AS (
       |  SELECT *,
       |    SUM(cost_micro) OVER (PARTITION BY scope ORDER BY release_id
       |      ROWS UNBOUNDED PRECEDING) AS cum,
       |    ($regionBudgetMicro // cost_micro) * cost_micro AS cap
       |  FROM plan)
       |SELECT release_id, scope, cost_micro,
       |  CAST(LEAST(cum - cost_micro, cap) AS BIGINT)
       |    AS spent_before_micro,
       |  cum <= $regionBudgetMicro AS granted,
       |  CAST(LEAST(cum, cap) AS BIGINT) AS spent_after_micro
       |FROM cum ORDER BY release_id""".stripMargin
  }
}
