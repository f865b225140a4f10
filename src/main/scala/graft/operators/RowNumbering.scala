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
}
