package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Similarity}

object EmbedProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = spark.read.parquet(s"$sfDir/embeddings.parquet")
    def time[T](label: String)(f: => T): Unit = (1 to 2).foreach { i =>
      val t0 = System.nanoTime()
      val r = f
      System.err.println(f"[prof] $label#$i ${(System.nanoTime() - t0) / 1e9}%.2fs ($r)")
    }
    val sigs = Similarity.lshSignatures(df, "embedding", "vec_id", 4, 16)
    time("signatures")(sigs.count())
    val cands = sigs.as("a").join(sigs.as("b"),
      col("a.table") === col("b.table") && col("a.sig") === col("b.sig") &&
        col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
    time("cand_prejoin")(cands.count())
    time("cand_distinct")(cands.distinct().count())
    time("full")(Dedup.embeddingNearDupPairsLsh(df, "embedding", "vec_id", 0.4, 4, 16).count())
    spark.stop()
  }
}
