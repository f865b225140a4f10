package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** W1 — global ROW_NUMBER (reference `settings.yaml:94`:
  * `ROW_NUMBER() OVER (ORDER BY EntryDateTime ASC) as Id`).
  *
  * A plain unpartitioned `Window.orderBy` collapses the whole table into
  * ONE partition — correct at test scale, dead at 100 TB. The scalable
  * shape used here:
  *
  *   1. `orderBy(keys)` — a range-partitioned sort (Spark samples key
  *      ranges, shuffles once, sorts each partition; every partition
  *      holds a contiguous key range).
  *   2. `rdd.zipWithIndex` — runs one lightweight count-per-partition
  *      job, then assigns each partition a cumulative offset and each row
  *      offset+localIndex. No data moves; ids are globally contiguous and
  *      ordered exactly as the sort.
  *
  * Cost at scale: one shuffle (the sort you were doing anyway) plus one
  * counting pass — vs. the single-partition window's "one executor sorts
  * 100 TB". The RDD hop does leave whole-stage codegen for this operator
  * boundary; acceptable because the surrounding stages stay codegen'd and
  * the alternative does not scale at all.
  *
  * `sortCols` MUST be a total order (include a unique tiebreak) or ids of
  * tied rows are nondeterministic across runs/engines.
  */
object RowNumbering {
  def withGlobalRowNumber(df: DataFrame, sortCols: Seq[Column],
                          idCol: String): DataFrame = {
    val spark = df.sparkSession
    val sorted = df.orderBy(sortCols: _*)
    val outSchema = StructType(
      sorted.schema.fields :+ StructField(idCol, LongType, nullable = false))
    val withIds = sorted.rdd.zipWithIndex().map { case (r, i) =>
      Row.fromSeq(r.toSeq :+ (i + 1L))
    }
    spark.createDataFrame(withIds, outSchema)
  }
}
