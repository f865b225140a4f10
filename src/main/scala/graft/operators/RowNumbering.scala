package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.lit

/** W1 — global ROW_NUMBER (reference `settings.yaml:94`:
  * `ROW_NUMBER() OVER (ORDER BY EntryDateTime ASC) as Id`).
  *
  * A plain unpartitioned `Window.orderBy` collapses the whole table into
  * ONE partition — correct at test scale, dead at 100 TB. The scalable
  * shape — range-partitioned sort + per-partition counts job + Tungsten
  * offset append — is [[PrefixSum]] with a constant value of 1: the
  * inclusive running total of 1s IS the row number, so this delegates
  * rather than duplicating the checkpoint/copy/serialized-storage
  * scaffold (see PrefixSum's scaladoc for the full cost and caching
  * narrative; it applies here verbatim).
  *
  * `sortCols` MUST be a total order (include a unique tiebreak) or ids
  * of tied rows are nondeterministic across runs/engines.
  */
object RowNumbering {
  def withGlobalRowNumber(df: DataFrame, sortCols: Seq[Column],
                          idCol: String): DataFrame =
    PrefixSum.withRunningTotal(
        df.withColumn("__rn_one", lit(1L)), sortCols, "__rn_one", idCol)
      .drop("__rn_one")

  /** EXACT `ntile(k)` from a global row number over n rows: with
    * q = n div k and r = n mod k, the first r tiles take q+1 rows and
    * the rest take q — SQL ntile's own definition. The
    * "(rn−1)·k div n + 1" shortcut previously used here is ntile ONLY
    * when k divides n (round driver-corpus sizes hid it); at any
    * remainder it places every row past the fat tiles one tile too
    * late, and at n < k it spreads rows over all k tiles instead of
    * the leading n (found by the round-16 edge-corpus sweep against
    * DuckDB's native ntile). */
  def ntileFromRowNumber(k: Int, n: Long, rnCol: String): Column = {
    val q = n / k
    val r = n % k
    if (q == 0L) // n < k: one row per LEADING tile; tile = rn
      org.apache.spark.sql.functions.expr(rnCol).cast("int")
    else org.apache.spark.sql.functions.expr(
      s"CASE WHEN $rnCol <= ${(q + 1) * r} " +
        s"THEN ($rnCol - 1) div ${q + 1} + 1 " +
        s"ELSE $r + ($rnCol - 1 - ${(q + 1) * r}) div $q + 1 END")
      .cast("int")
  }
}
