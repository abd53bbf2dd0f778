package graft.tools

import org.apache.spark.sql.SparkSession

/** Run one SparkEntry query N times with wall + steal timing — the
  * smallest reproduction of a bench number (`runMain graft.tools.OneQuery
  * q_name [reps]`, SPARK_GRAFT_SF_DIR selects the scale). */
object OneQuery {
  private def steal(): Long = graft.Bench.stealJiffies()

  def main(args: Array[String]): Unit = {
    val name = args(0)
    val reps = if (args.length > 1) args(1).toInt else 3
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    (1 to reps).foreach { i =>
      val s0 = steal(); val t0 = System.nanoTime()
      val n = graft.SparkEntry.queries(name)(spark, sfDir).count()
      System.err.println(f"[one] $name#$i ${(System.nanoTime() - t0) / 1e9}%.2fs " +
        s"steal=${steal() - s0} rows=$n")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
