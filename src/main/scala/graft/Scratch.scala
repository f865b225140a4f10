package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway profiling harness (not part of the driver contract). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"$name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    val docs = Tables(spark, dir, "documents")
    println("docs: " + docs.count())
    val grams = docs.select(col("doc_id"),
      explode(graft.ext.Dedup.shingles3(col("text"))).as("g"))
    grams.select(max("g")).collect() // warm-up
    println("grams rows: " + grams.count())
    val inv = grams.groupBy("g")
      .agg(sort_array(collect_set(col("doc_id"))).as("ds"))
      .filter(size(col("ds")).between(2, graft.ext.Dedup.jaccardDocfreqCap))
    time("inv (groupBy collect_set + filter)") {
      println("  inv rows: " + inv.count())
    }
    val pairsOf = flatten(transform(col("ds"), a =>
      transform(filter(col("ds"), b => b > a), b =>
        struct(a.as("doc_a"), b.as("doc_b")))))
    val cand = inv.select(explode(pairsOf).as("p"))
      .select(col("p.doc_a").as("doc_a"), col("p.doc_b").as("doc_b"))
      .groupBy("doc_a", "doc_b").count().filter(col("count") >= 3).select("doc_a", "doc_b")
    time("cand (pair explode + distinct)") {
      println("  cand rows: " + cand.count())
    }
    println("final pairs sf0.1: " + graft.ext.Dedup.qDedupJaccard(spark, dir).count())
    time("full jaccard") {
      graft.ext.Dedup.qDedupJaccard(spark, dir)
        .write.mode("overwrite").format("noop").save()
    }
    spark.stop()
  }
}
