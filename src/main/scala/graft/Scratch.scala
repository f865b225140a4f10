package graft
import org.apache.spark.sql.SparkSession

/** Throwaway profiling harness (not part of the driver contract):
  * isolated min-of-3 timings for named SparkEntry queries (args), after
  * one untimed warm-up each. Run with nothing else on the machine —
  * concurrent JVMs inflate timings ~4×. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = if (args.nonEmpty) args.toSeq else SparkEntry.queries.keys.toSeq.sorted
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      def once(): Double = {
        val t0 = System.nanoTime()
        fn(spark, dir).write.mode("overwrite").format("noop").save()
        (System.nanoTime() - t0) / 1e9
      }
      once() // warm-up
      val times = (1 to 3).map(_ => once())
      println(f"$name: min ${times.min}%.2f s  (passes: ${times.map(t => f"$t%.2f").mkString(", ")})")
    }
    spark.stop()
  }
}
