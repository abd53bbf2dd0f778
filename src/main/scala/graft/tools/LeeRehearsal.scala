package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.features.OrderbookFeatures

/** Density rehearsal for the round-11 Lee–Ready chain
  * ([[OrderbookFeatures.leeReady]] → implementation-shortfall agg): the
  * chain is ONE tagged-union as-of sweep plus series-keyed windows and
  * one grouped agg, so its wall must grow LINEARLY in trade density —
  * no pair frame, no join fan-out anywhere (PlanSpec pins the
  * join-free plan; this harness pins the growth curve). Quotes stay at
  * one per (series, hour) — the q_lee_ready shape — so quote volume is
  * density-invariant and only the tape grows.
  *
  * Workload: 32 series, 10 days, d trades/hour/series with a
  * deterministic hash-walk price (both quote-test and tick-rule paths
  * exercised); honest full-column materialization.
  *
  * Usage: `runMain graft.tools.LeeRehearsal` (env
  * `SPARK_GRAFT_LEE_MULTS` overrides the default 1,10,100). */
object LeeRehearsal {
  def main(args: Array[String]): Unit = {
    val mults = sys.env.getOrElse("SPARK_GRAFT_LEE_MULTS", "1,10,100")
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

    def tradesAt(d: Int): DataFrame = {
      val n = series * hours * d
      // the synthetic tape must stay on the hourly quote grid — a
      // non-divisor density would truncate stepUs and drift the ticks,
      // silently skewing the density-scaling comparison
      require(3600000000L % d == 0,
        s"SPARK_GRAFT_LEE_MULTS density $d does not divide an hour of " +
          "microseconds evenly; pick a divisor of 3600000000 (e.g. 1,10,100)")
      val stepUs = 3600000000L / d
      spark.range(n).select(
        concat(lit("s"), (col("id") % series).cast("string")).as("k"),
        timestamp_micros(expr(s"(id div $series) * ${stepUs}L")).as("tts"),
        // hash-walk price around the 100 mid: at-mid, above and below
        // all occur, so the quote test AND the tick-rule carry run
        (lit(100.0) + (pmod(xxhash64(col("id")), lit(5L)) - lit(2L))
          .cast("double") * lit(0.25)).as("price"),
        col("id").as("tid"))
    }
    def quotesOf(): DataFrame =
      spark.range(series * hours).select(
        concat(lit("s"), (col("id") % series).cast("string")).as("k"),
        timestamp_micros(expr(s"(id div $series) * 3600000000L")).as("qts"),
        (lit(99.5) + (pmod(xxhash64(col("id")), lit(3L))).cast("double") * lit(0.05))
          .as("bid"),
        (lit(100.5) + (pmod(xxhash64(col("id") + 7L), lit(3L))).cast("double") * lit(0.05))
          .as("ask"))

    def timed[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime()
      val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }
    // honest materialization over the classification AND both spread
    // columns, plus the parent-order shortfall reduction on top
    def mat(lr: DataFrame): Long = {
      val shortfall = lr
        .where(col("lr_side").isNotNull && col("mid").isNotNull)
        .withColumn("bucket", expr("(ts_us - pmod(ts_us, 3600000000L)) div 3600000000L"))
        .groupBy(col("k"), col("bucket"), col("lr_side"))
        .agg(count(lit(1)).as("n"), sum(col("espread")).as("se"),
          sum(col("espread_rel")).as("sr"))
      val r = shortfall.agg(count(lit(1)), sum("n"), sum("se"), sum("sr"))
        .collect()(0)
      r.getLong(1)
    }

    val quotes = quotesOf().localCheckpoint(true)
    val results = mults.map { d =>
      val tr = tradesAt(d).localCheckpoint(true)
      val (n, t) = timed(mat(OrderbookFeatures.leeReady(
        tr, quotes, Seq("k"), tradeTs = "tts", priceCol = "price",
        tiebreakCol = "tid", quoteTs = "qts", bidCol = "bid", askCol = "ask")))
      System.err.println(f"[lee-rehearsal] d=$d trades=${series * hours * d} " +
        f"wall=${t}%.1fs (classified $n)")
      (d, series * hours * d, t)
    }
    val json = results.map { case (d, n, t) =>
      f"""{"density":$d,"trades":$n,"wall_sec":$t%.2f}"""
    }.mkString("""{"metric":"lee_ready_density_rehearsal","runs":[""", ",", "]}")
    println(json)
    spark.stop()
  }
}
