package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.Labeling

/** Density rehearsal for [[Labeling.averageUniqueness]] (round 11): the
  * round-10 band-join shape materialized one row per (tick, covering
  * span); with horizon-length labels, BOTH the span count and each
  * span's tick coverage grow with tick density d, so pair volume grows
  * ~d² — VERDICT r10's scale-killer. The round-11 sweep is O(ticks +
  * spans) = O(d). This harness measures both walls on the same synthetic
  * workload at tick densities 1×/10×/100× (the retired pair shape is
  * re-created inline here, capped at 10× where its pair frame is already
  * ~100× the sweep's row count) and prints a JSON line for BASELINE.md.
  *
  * Workload: 32 series, 10 days, d ticks/hour/series; every tick opens
  * a 6-hour label (the q_avg_uniqueness shape: average concurrency = 6d).
  *
  * Usage: `runMain graft.tools.UniquenessRehearsal` (env
  * `SPARK_GRAFT_UNIQ_MULTS` overrides the default 1,10,100). */
object UniquenessRehearsal {
  def main(args: Array[String]): Unit = {
    val mults = sys.env.getOrElse("SPARK_GRAFT_UNIQ_MULTS", "1,10,100")
      .split(",").map(_.trim.toInt).toSeq
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_GRAFT_MASTER", "local[32]"))
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val hours = 240L // 10 days
    val series = 32L

    def ticksAt(d: Int): DataFrame = {
      val n = series * hours * d
      val stepUs = 3600000000L / d
      spark.range(n).select(
        concat(lit("s"), (col("id") % series).cast("string")).as("k"),
        expr(s"(id div $series) * ${stepUs}L").as("ts_us"),
        col("id").as("tick_id"))
    }
    def spansOf(tk: DataFrame): DataFrame = tk.select(
      col("k"), col("tick_id").as("id"), col("ts_us").as("t0"),
      (col("ts_us") + 6L * 3600000000L).as("t1"))

    def timed[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime()
      val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }
    // honest materialization: aggregate over every output column so the
    // whole plan executes (no count-driven pruning)
    def mat(df: DataFrame): Long = {
      val r = df.agg(count(lit(1)), sum(col("n_ticks")),
        sum(col("uniqueness")), sum(col("weight"))).collect()(0)
      r.getLong(0)
    }

    /** The RETIRED round-10 pair shape, inlined for the growth
      * comparison only (bucketed tick×span band join; the production
      * operator no longer builds this frame). */
    def pairShape(tk0: DataFrame, sp0: DataFrame, bucketUs: Long): DataFrame = {
      val tk = tk0.select(col("k"), col("ts_us").as("_ts"))
        .withColumn("_b", expr(s"_ts div ${bucketUs}L"))
      val sp = sp0.select(col("k"), col("id").as("_id"),
          col("t0").as("_t0"), col("t1").as("_t1"))
        .withColumn("_b",
          explode(expr(s"sequence(_t0 div ${bucketUs}L, _t1 div ${bucketUs}L)")))
      val pairs = tk.join(sp, Seq("k", "_b"))
        .where(col("_ts") >= col("_t0") && col("_ts") <= col("_t1"))
      val wTick = Window.partitionBy(col("k"), col("_ts"))
      val perSpan = pairs
        .withColumn("_c", count(lit(1)).over(wTick))
        .groupBy(col("k"), col("_id"))
        .agg(min("_t0").as("t0_us"), min("_t1").as("t1_us"),
          count(lit(1)).as("n_ticks"),
          sum(round(lit(1e9) / col("_c").cast("double")).cast("long")).as("_su"))
        .withColumn("uniqueness",
          round(col("_su").cast("double") / 1e9 / col("n_ticks").cast("double"), 6))
        .withColumn("_uq", round(col("uniqueness") * 1e6).cast("long"))
      val wKey = Window.partitionBy(col("k"))
      perSpan.withColumn("weight",
        round(col("_uq").cast("double") * count(lit(1)).over(wKey).cast("double")
          / sum(col("_uq")).over(wKey).cast("double"), 6))
    }

    val results = mults.map { d =>
      val tk = ticksAt(d).localCheckpoint(true)
      val sp = spansOf(tk).localCheckpoint(true)
      val (nSweep, tSweep) = timed(mat(Labeling.averageUniqueness(
        tk, sp, Seq("k"), "ts_us", "id", "t0", "t1",
        bucketUs = 6L * 3600000000L)))
      val (nPairs, tPairs) =
        if (d <= sys.env.getOrElse("SPARK_GRAFT_UNIQ_PAIR_CAP", "10").toInt)
          timed(mat(pairShape(tk, sp, 6L * 3600000000L)))
        else (-1L, -1.0)
      System.err.println(f"[uniq-rehearsal] d=$d ticks=${series * hours * d} " +
        f"sweep=${tSweep}%.1fs ($nSweep spans) pairs=${tPairs}%.1fs")
      (d, series * hours * d, tSweep, tPairs)
    }
    val json = results.map { case (d, n, ts, tp) =>
      f"""{"density":$d,"ticks":$n,"sweep_sec":$ts%.2f,"pairs_sec":$tp%.2f}"""
    }.mkString("""{"metric":"avg_uniqueness_density_rehearsal","runs":[""", ",", "]}")
    println(json)
    spark.stop()
  }
}
