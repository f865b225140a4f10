package graft

import org.apache.spark.sql.types._

/** Testdata schema smoke alarm (VERDICT r8 ask #3).
  *
  * The driver regenerates /root/testdata between rounds, and round 8 lost
  * 12 queries to a silent layout drift (events.ts moved from
  * TIMESTAMP(NANOS) to TIMESTAMP_MICROS). This suite opens every table
  * through the engine's own reader (`Tables.apply`, which carries the
  * schema-adaptive branch) and asserts the ENGINE-FACING schema — so the
  * next drift fails here first, loudly, naming the exact column, instead
  * of surfacing as 10 obscure analysis errors scattered across suites.
  *
  * The assertions are on post-adaptation types: whatever physical layout
  * `ts` arrives in, the engine must present TimestampType.
  */
class TablesSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  /** Expected engine-facing (name, type) list per table, in order.
    * Nullability is not asserted (parquet round-trips it loosely). */
  private val expected: Map[String, Seq[(String, DataType)]] = Map(
    "region" -> Seq("r_regionkey" -> IntegerType, "r_name" -> StringType),
    "nation" -> Seq("n_nationkey" -> IntegerType, "n_name" -> StringType,
      "n_regionkey" -> IntegerType),
    "customer" -> Seq("c_custkey" -> LongType, "c_name" -> StringType,
      "c_nationkey" -> IntegerType, "c_acctbal" -> DoubleType,
      "c_mktsegment" -> StringType),
    "supplier" -> Seq("s_suppkey" -> LongType, "s_name" -> StringType,
      "s_nationkey" -> IntegerType, "s_acctbal" -> DoubleType),
    "part" -> Seq("p_partkey" -> LongType, "p_name" -> StringType,
      "p_brand" -> StringType, "p_type" -> StringType,
      "p_size" -> IntegerType, "p_retailprice" -> DoubleType),
    "orders" -> Seq("o_orderkey" -> LongType, "o_custkey" -> LongType,
      "o_orderstatus" -> StringType, "o_totalprice" -> DoubleType,
      "o_orderdate" -> TimestampType, "o_orderpriority" -> StringType),
    "lineitem" -> Seq("l_orderkey" -> LongType, "l_partkey" -> LongType,
      "l_suppkey" -> LongType, "l_linenumber" -> IntegerType,
      "l_quantity" -> DoubleType, "l_extendedprice" -> DoubleType,
      "l_discount" -> DoubleType, "l_tax" -> DoubleType,
      "l_returnflag" -> StringType, "l_linestatus" -> StringType,
      "l_shipdate" -> TimestampType),
    "events" -> Seq("event_id" -> LongType, "ts" -> TimestampType,
      "user_id" -> LongType, "event_type" -> StringType,
      "value" -> DoubleType, "props" -> StringType),
    "documents" -> Seq("doc_id" -> LongType, "text" -> StringType,
      "lang" -> StringType, "source" -> StringType, "n_chars" -> LongType),
    "embeddings" -> Seq("vec_id" -> LongType,
      "embedding" -> ArrayType(FloatType, containsNull = true),
      "label" -> IntegerType)
  )

  /** Compare ignoring nullability (incl. inside arrays). */
  private def sameType(a: DataType, b: DataType): Boolean = (a, b) match {
    case (ArrayType(ea, _), ArrayType(eb, _)) => sameType(ea, eb)
    case _ => a == b
  }

  for (name <- Tables.names) {
    test(s"testdata schema: $name") {
      val exp = expected(name)
      val got = Tables(spark, sfDir, name).schema
      val gotMap = got.fields.map(f => f.name -> f.dataType).toMap

      val missing = exp.collect { case (n, _) if !gotMap.contains(n) => n }
      assert(missing.isEmpty,
        s"\nTESTDATA DRIFT in $name.parquet: expected column(s) " +
          s"${missing.mkString(", ")} are ABSENT. Arrived columns: " +
          got.fields.map(_.name).mkString(", "))

      val drifted = exp.collect {
        case (n, t) if !sameType(gotMap(n), t) =>
          s"$n (expected ${t.simpleString}, arrived ${gotMap(n).simpleString})"
      }
      assert(drifted.isEmpty,
        s"\nTESTDATA DRIFT in $name.parquet — column type changed: " +
          drifted.mkString("; ") +
          ". If the new layout is legitimate, teach Tables.apply to adapt " +
          "(like the events.ts nanos/micros branch) and update this spec.")

      val extra = got.fields.map(_.name).filterNot(exp.map(_._1).toSet)
      assert(extra.isEmpty,
        s"\nTESTDATA DRIFT in $name.parquet: unexpected new column(s) " +
          extra.mkString(", "))
    }
  }

  test("events reader adapts: engine-facing ts is a real timestamp with data") {
    val e = Tables(spark, sfDir, "events")
    assert(e.schema("ts").dataType === TimestampType)
    val n = e.where(org.apache.spark.sql.functions.col("ts").isNotNull).count()
    assert(n > 0, "events.ts read as all-null — reader adaptation broken")
  }
}
