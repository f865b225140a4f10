package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators.DpRelease

/** PRIVACY-BUDGET LEDGER — the accounting half of [[DpRelease]]: under
  * sequential composition every release SPENDS ε from a per-scope
  * budget, and a system that doesn't track the cumulative spend has no
  * privacy guarantee at all (ε adds up; the mechanism is only as good
  * as its ledger). The spend stream is a per-scope SUM monoid, so the
  * ledger is a [[MonoidStore]]: one (scope, eps_micro) delta dir per
  * release, replay-idempotent by the overwrite layout (re-running a
  * crashed release re-writes ITS OWN spend instead of double-charging
  * the budget), compaction/recovery inherited.
  *
  * [[release]] is the guarded entry point: it checks the scope's
  * remaining budget BEFORE computing anything, REFUSES (returns None,
  * writes nothing) when the release's cost would exceed it, and
  * otherwise records the spend and returns the released aggregates.
  * Refusal-before-compute is the contract auditors look for — a
  * budget check after the query ran has already spent the ε. */
object PrivacyLedger {

  def store(storePath: String): MonoidStore =
    MonoidStore.sums(storePath, "eps_micro")

  /** Cumulative spend for one scope (0 when never charged). */
  def spent(spark: SparkSession, storePath: String, scope: String): Long = {
    if (!new java.io.File(storePath).exists) return 0L
    import org.apache.spark.sql.functions._
    val r = store(storePath).merged(spark)
      .filter(col("scope") === scope)
      .agg(sum("eps_micro")).head()
    if (r.isNullAt(0)) 0L else r.getLong(0)
  }

  /** The full per-scope ledger. */
  def ledgerView(spark: SparkSession, storePath: String): DataFrame =
    store(storePath).merged(spark)

  /** Guarded DP release: charge `costMicro` against `scope`'s
    * `budgetMicro` under release id `releaseId` and return the
    * released frame — or refuse (None, nothing written, nothing
    * computed) when the remaining budget can't cover it. Re-running a
    * release id overwrites its own spend dir (idempotent charge). */
  def release(spark: SparkSession, dir: String, storePath: String,
              scope: String, releaseId: Long, budgetMicro: Long)
      : Option[DataFrame] = {
    import spark.implicits._
    val cost = DpRelease.epsCountMicro + DpRelease.epsSumMicro
    // a REPLAY of an already-charged release doesn't re-spend: its dir
    // will be overwritten, so exclude its own prior charge from the
    // remaining-budget check
    val already = spentExcluding(spark, storePath, scope, releaseId)
    if (already + cost > budgetMicro) None
    else {
      store(storePath).append(
        Seq((scope, cost)).toDF("scope", "eps_micro"), releaseId)
      Some(DpRelease.qDpCounts(spark, dir))
    }
  }

  private def spentExcluding(spark: SparkSession, storePath: String,
                             scope: String, releaseId: Long): Long = {
    if (!new java.io.File(storePath).exists) return 0L
    import org.apache.spark.sql.functions._
    val raw = spark.read.parquet(storePath)
    val others =
      if (raw.columns.contains("batch"))
        raw.filter(col("batch") =!= releaseId).drop("batch")
      else raw
    val r = store(storePath).reduce(others)
      .filter(col("scope") === scope).agg(sum("eps_micro")).head()
    if (r.isNullAt(0)) 0L else r.getLong(0)
  }
}
