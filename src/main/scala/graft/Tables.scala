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
    spark.read.parquet(s"$dir/$name.parquet")

  /** Register all tables as temp views so programs can also be written in
    * Spark SQL (the reference keeps its relational logic as SQL strings —
    * settings.yaml:24-63,88-123,132-140). */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => apply(spark, dir, n).createOrReplaceTempView(n))
}
