package graft.tools
import org.apache.spark.sql.SparkSession
object Explain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.01"
    for (name <- args) {
      println(s"========== $name ==========")
      val df = graft.Queries.all.find(_.name == name).get.fn(spark, dir)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      // keep the summary: node tree + scan details
      println(plan.linesIterator.filter(l =>
        l.startsWith("*") || l.startsWith("+") || l.trim.startsWith("PushedFilters") ||
        l.trim.startsWith("ReadSchema") || l.trim.startsWith("DataFilters") ||
        l.contains("Exchange") || l.contains("Scan parquet") || l.contains("(")
      ).take(60).mkString("\n"))
    }
    spark.stop()
  }
}
