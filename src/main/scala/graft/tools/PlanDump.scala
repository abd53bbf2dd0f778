package graft.tools

import org.apache.spark.sql.SparkSession

/** Dump `.explain("formatted")` for named queries to
  * `plans/<tag>/<name>_<suffix>.txt` — the optimization-round evidence
  * format (the judge checks plan claims against these files).
  *
  * Usage: runMain graft.tools.PlanDump <outDir> <suffix> <q1> [q2 ...]
  *   e.g. runMain graft.tools.PlanDump plans/r13 before q_sadf q_corr_mst
  *
  * The session mirrors graft.Bench (local[$SPARK_GRAFT_CPUS], shuffle
  * partitions = cpus, UTC) so the dumped plan is the benched plan.
  * Driver-loop queries (chunked folds, iterative solvers) run jobs at
  * PLAN TIME; that is expected — the dump is still the final frame's
  * plan, which is what the bench materializes.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val suffix = args(1)
    val names = args.drop(2)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    new java.io.File(outDir).mkdirs()
    names.foreach { name =>
      val fn = graft.SparkEntry.queries.getOrElse(name,
        sys.error(s"unknown query $name"))
      val df = fn(spark, sfDir)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      val w = new java.io.PrintWriter(
        new java.io.File(s"$outDir/${name}_$suffix.txt"), "UTF-8")
      try w.println(plan) finally w.close()
      val nExchange = plan.linesIterator.count(_.contains("Exchange"))
      System.err.println(s"[plandump] $name -> $outDir/${name}_$suffix.txt " +
        s"(${plan.linesIterator.size} lines, $nExchange Exchange)")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
