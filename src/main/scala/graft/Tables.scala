package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver's deterministic parquet testdata
  * (TESTDATA.md — TPC-H-ish star schema + events/documents/embeddings).
  *
  * All queries take the scale-factor dir as a parameter so the same code
  * runs at sf0.001 (smoke), sf0.01 (correctness), sf0.1 (bench) and, on a
  * real cluster, against any path. Parquet scans get Catalyst column
  * pruning + predicate pushdown for free — see `.explain` in specs.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") {
      // events.ts is parquet TIMESTAMP(NANOS), which Spark's reader
      // rejects ([PARQUET_TYPE_ILLEGAL]). Read nanos as long (session
      // conf — only affects NANOS columns, which otherwise error) and
      // convert to a microsecond timestamp. Integer `div` avoids the
      // double rounding a plain `/` would introduce on ~1e18 values.
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      spark.read.parquet(s"$dir/$name.parquet")
        .withColumn("ts",
          org.apache.spark.sql.functions.timestamp_micros(
            org.apache.spark.sql.functions.expr("ts div 1000")))
    } else spark.read.parquet(s"$dir/$name.parquet")

  /** Register all tables as temp views so programs can also be written in
    * Spark SQL (the reference keeps its relational logic as SQL strings —
    * settings.yaml:24-63,88-123,132-140). */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => apply(spark, dir, n).createOrReplaceTempView(n))
}
