package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Dedup

object SpanProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    def time[T](label: String)(f: => T): Unit = (1 to 2).foreach { i =>
      val t0 = System.nanoTime()
      val r = f
      System.err.println(f"[prof] $label#$i ${(System.nanoTime() - t0) / 1e9}%.2fs ($r)")
    }
    time("shingleArrays8")(Dedup.shingleArrays(docs, "text", "doc_id", 8).count())
    time("shingleRows8")(Dedup.shingleRows(docs, "text", "doc_id", 8).count())
    val rows = Dedup.shingleRows(docs, "text", "doc_id", 8)
      .select(xxhash64(col("s")).as("h"), col("s"), col("id"))
    time("group")(rows.groupBy("h").agg(count(lit(1)).as("n"), min(col("s")).as("span"))
      .filter(col("n") >= 2).count())
    // CC profile
    val pairs = Dedup.jaccardSimilarityJoin(docs, "text", "doc_id", 3, 0.8)
      .persist()
    time("jaccard_pairs")(pairs.count())
    time("cc")(Dedup.connectedComponents(pairs).count())
    pairs.unpersist()
    spark.stop()
  }
}
