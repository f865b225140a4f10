package graft
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ext.Dedup

object Scratch2 {
  def main(args: Array[String]): Unit = {
    val dir = "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def mat(df: DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()
    def time(name: String)(f: => DataFrame): Unit = {
      mat(f)
      val runs = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); mat(f); (System.nanoTime() - t0) / 1e9
      }
      println(f"$name: ${runs.min}%.2f s (min of 3)")
    }
    val docs = Tables(spark, dir, "documents")
    def variant(): DataFrame = {
      val grams = docs.select(col("doc_id"),
        explode(transform(Dedup.shingles3(col("text")), g => xxhash64(g))).as("g"))
      val dfq = grams.groupBy("g").agg(count(lit(1)).as("df"))
      val rare = grams.join(
        dfq.filter(col("df").between(2, Dedup.jaccardDocfreqCap)), "g")
        .select("doc_id", "g")
      val cand = rare.as("a").join(rare.as("b"),
          col("a.g") === col("b.g") && col("a.doc_id") < col("b.doc_id"))
        .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
        .agg(count(lit(1)).as("shared"))
        .filter(col("shared") >= Dedup.jaccardMinCommonRare)
        .select("doc_a", "doc_b")
        .localCheckpoint()
      val candIds = cand.select(col("doc_a").as("doc_id"))
        .union(cand.select(col("doc_b").as("doc_id"))).distinct()
      val gsets = docs.join(candIds, Seq("doc_id"), "left_semi")
        .select(col("doc_id"),
          transform(Dedup.shingles3(col("text")), g => xxhash64(g)).as("gs"))
        .localCheckpoint()
      val i = size(array_intersect(col("ga.gs"), col("gb.gs"))).cast("double")
      cand
        .join(gsets.as("ga"), col("doc_a") === col("ga.doc_id"))
        .join(gsets.as("gb"), col("doc_b") === col("gb.doc_id"))
        .select(col("doc_a"), col("doc_b"),
          (i / (size(col("ga.gs")) + size(col("gb.gs")) - i)).as("jacc"))
        .filter(col("jacc") >= 0.2)
    }
    time("jaccard join-variant")(variant())
    time("jaccard current")(Dedup.qDedupJaccard(spark, dir))
    // cross-check results agree
    val a = variant().collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val b = Dedup.qDedupJaccard(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    println("same pairs: " + (a == b) + " n=" + a.size)
    spark.stop()
  }
}
