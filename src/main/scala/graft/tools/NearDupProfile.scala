package graft.tools

import org.apache.spark.sql.SparkSession

import graft.operators.Dedup

/** Wall-clock profiler for the shingle near-dup family at bench scale.
  * Used in round 2 to pin the slow stage: the round-1 formulations spent
  * their time in deep shuffle DAGs (window-ranked postings, cached
  * exploded frames) whose many small stages amplified host-noise stalls —
  * not in data volume. The per-row array formulations collapsed the DAG. */
object NearDupProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val reps = sys.env.getOrElse("SPARK_GRAFT_PROF_REPS", "2").toInt
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")

    def time[T](label: String)(f: => T): Unit = (1 to reps).foreach { i =>
      val t0 = System.nanoTime()
      val r = f
      System.err.println(f"[prof] $label#$i ${(System.nanoTime() - t0) / 1e9}%.2fs ($r)")
      spark.catalog.clearCache()
    }

    time("shingleHashArrays")(
      Dedup.shingleHashArrays(docs, "text", "doc_id", 3).count())
    time("minhashNearDupPairs")(
      Dedup.minhashNearDupPairs(docs, "text", "doc_id", 3, 64, 16, 0.8).count())
    time("jaccardSimilarityJoin")(
      Dedup.jaccardSimilarityJoin(docs, "text", "doc_id", 3, 0.8).count())
    time("simhashNearDupPairs")(
      Dedup.simhashNearDupPairs(docs, "text", "doc_id", 3).count())
    spark.stop()
  }
}
