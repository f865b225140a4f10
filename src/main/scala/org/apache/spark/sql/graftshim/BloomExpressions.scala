package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.classic.ExpressionUtils

/** Native surface over Spark's own Bloom-filter expressions — the pair
  * Catalyst itself uses for runtime filter injection
  * (`InjectRuntimeFilter`): `BloomFilterAggregate` builds the filter
  * distributed (update per partition, `mergeInPlace` at combine — a
  * treeAggregate in aggregate-expression form), and
  * `BloomFilterMightContain` probes it with codegen. Exposed through
  * the shim because neither is registered in the public function
  * registry; using the engine's own expressions beats both a Scala UDF
  * (no codegen, boxing per row) and `DataFrameStatFunctions.bloomFilter`
  * (driver-side filter object, probe via UDF only).
  *
  * Both sides hash with xxhash64 to LongType FIRST (the aggregate's
  * long path is the one runtime filtering exercises), so build and
  * probe agree by construction. */
object BloomExpressions {

  /** Aggregate column: a serialized Bloom filter (binary) over the
    * LONG child values. `numBits` per standard Bloom sizing —
    * `BloomProbe` computes it from (items, fpRate). */
  def bloomFilterAgg(child: Column, estimatedItems: Long,
                     numBits: Long): Column =
    ExpressionUtils.column(new BloomFilterAggregate(
      ExpressionUtils.expression(child),
      Literal(estimatedItems), Literal(numBits))
      .toAggregateExpression())

  /** Probe predicate: value (long) might be in `filter` (binary). */
  def mightContain(filter: Column, value: Column): Column =
    ExpressionUtils.column(BloomFilterMightContain(
      ExpressionUtils.expression(filter),
      ExpressionUtils.expression(value)))
}
