package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Long-axis rehearsal for [[graft.operators.Relational.dfa]] (the
  * realized-vol-rehearsal doctrine: measure the envelope, don't assume
  * it): drives DFA at ×1/×10/×100 the suite's per-key bucket count on
  * a deterministic synthetic panel and records walls, the measured
  * `max|Ỹ|` of the integer profile against its 2⁶³ overflow bound, and
  * the recovered scaling exponents (noise ≈ 0.5 / walk ≈ 1.5 must hold
  * at every length — a silent overflow would corrupt them first).
  *
  * `runMain graft.tools.DfaRehearsal [buckets]` — default
  * 3400,34000,340000 (sf0.1's hourly span and two decades up).
  */
object DfaRehearsal {
  private def time[A](f: => A): (A, Double) = {
    val t0 = System.nanoTime(); val a = f
    (a, (System.nanoTime() - t0) / 1e9)
  }

  def main(args: Array[String]): Unit = {
    val ns = if (args.nonEmpty) args(0).split(",").map(_.trim.toInt).toSeq
             else Seq(3400, 34000, 340000)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.operators.Relational

    ns.foreach { n =>
      // two series per length: hash noise around a level (α ≈ 0.5) and
      // its running sum (α ≈ 1.5); values stay 2-dp-scale like events
      val noise = spark.range(n.toLong).select(
        lit("W").as("k"), col("id").as("hb"),
        (lit(100.0) + pmod(xxhash64(col("id")), lit(2000)).cast("double")
          / 1000.0 - 1.0).as("v"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(lit(1)).orderBy(col("hb"))
      val walk = spark.range(n.toLong).select(lit("B").as("k"),
          col("id").as("hb"),
          (pmod(xxhash64(col("id")), lit(2000)).cast("double") / 1000.0 - 1.0)
            .as("dv"))
        .withColumn("v", lit(1000.0) + sum(col("dv")).over(w))
        .select("k", "hb", "v")
      val panel = noise.unionByName(walk).localCheckpoint()
      // measured |Ỹ| envelope: the integer profile the operator builds
      val prof = panel
        .select(col("k"), col("hb"), floor(col("v") * 1e4).cast("long").as("vq"))
        .withColumn("idx", row_number().over(
          org.apache.spark.sql.expressions.Window.partitionBy(col("k"))
            .orderBy(col("hb"))).cast("long"))
        .withColumn("c", sum(col("vq")).over(
          org.apache.spark.sql.expressions.Window.partitionBy(col("k"))
            .orderBy(col("hb"))))
        .withColumn("nn", count(lit(1)).over(
          org.apache.spark.sql.expressions.Window.partitionBy(col("k"))))
        .withColumn("sv", sum(col("vq")).over(
          org.apache.spark.sql.expressions.Window.partitionBy(col("k"))))
        .withColumn("yt", col("nn") * col("c") - col("idx") * col("sv"))
      val maxY = prof.agg(max(abs(col("yt")))).collect()(0).getLong(0)
      val (out, wall) = time(
        Relational.dfa(panel, "k", "hb", "v", scale = 1e4).collect())
      val byK = out.filter(_.getAs[Long]("n") == 8L)
        .map(r => r.getAs[String]("key") -> r.getAs[Double]("alpha")).toMap
      val headroom = 9.2e18 / maxY.toDouble
      println(f"buckets=$n%-7d wall=$wall%6.1fs  max|Y~|=$maxY%.3e  " +
        f"i64 headroom=${headroom}%.1e  alphaW=${byK.getOrElse("W", Double.NaN)}%.3f  " +
        f"alphaB=${byK.getOrElse("B", Double.NaN)}%.3f")
    }
    spark.stop()
  }
}
