package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch probe: which join shapes stay exchange-free over
  * SinglePartition children in this Spark build. */
object PartProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val a = spark.range(10).select(col("id").as("k"), lit(1L).as("x"))
      .localCheckpoint().coalesce(1)
    val b = spark.range(10).select(col("id").as("k"), lit(2L).as("y"))
      .localCheckpoint().coalesce(1)
    def show(tag: String, df: org.apache.spark.sql.DataFrame): Unit = {
      val p = df.queryExecution.executedPlan.toString
      println(s"===== $tag: exchanges=${p.linesIterator.count(_.contains("Exchange"))}")
      println(p.linesIterator.take(14).mkString("\n"))
    }
    // the leadingEigen num-tail shape: union→coalesce pair frame joined
    // twice (different keys) against the same vector, then global agg
    val pairs = spark.range(10).select(col("id").cast("string").as("a"),
        col("id").cast("string").as("b"), lit(3L).as("covq"))
      .localCheckpoint().coalesce(1)
    val sym = pairs.unionByName(pairs.where(col("a") =!= col("b"))
      .select(col("b").as("a"), col("a").as("b"), col("covq"))).coalesce(1)
    val vf = spark.range(10).select(col("id").cast("string").as("k"), lit(5L).as("vq"))
      .localCheckpoint().coalesce(1)
    val num = sym
      .join(vf.select(col("k").as("a"), col("vq").as("va")).hint("shuffle_hash"), Seq("a"))
      .join(vf.select(col("k").as("b"), col("vq").as("vb")).hint("shuffle_hash"), Seq("b"))
      .agg(sum(col("covq") * col("va") * col("vb")).as("num"))
    show("num-tail", num)
    val num2 = sym
      .join(vf.select(col("k").as("a"), col("vq").as("va")).hint("shuffle_hash"), Seq("a"))
      .coalesce(1)
      .join(vf.select(col("k").as("b"), col("vq").as("vb")).hint("shuffle_hash"), Seq("b"))
      .coalesce(1)
      .agg(sum(col("covq") * col("va") * col("vb")).as("num"))
    show("num-tail-coalesced", num2)
    val round = sym
      .join(vf.select(col("k").as("b2"), col("vq")).hint("shuffle_hash"),
        col("b") === col("b2"))
      .coalesce(1)
      .groupBy(col("a")).agg(sum(col("covq") * col("vq")).as("mv"))
      .withColumn("nrm", sum(col("mv")).over(
        org.apache.spark.sql.expressions.Window.partitionBy()))
    show("round-coalesced", round)
    show("join1-only", sym
      .join(vf.select(col("k").as("a"), col("vq").as("va")).hint("shuffle_hash"), Seq("a")))
    show("shj-hint", a.join(b.hint("shuffle_hash"), Seq("k")))
    show("merge-hint", a.join(b.hint("merge"), Seq("k")))
    show("plain", a.join(b, Seq("k")))
    show("groupBy-after-coalesce", a.groupBy("k").agg(sum(col("x"))))
    show("window-global", a.withColumn("s",
      sum(col("x")).over(org.apache.spark.sql.expressions.Window.partitionBy())))
    spark.stop()
  }
}
