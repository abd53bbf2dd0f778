package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Long-axis (tick-density) rehearsal for the round-12 realized-vol
  * family (VERDICT r12 #7): [[graft.functions.TaIndicators.twoScaleRV]],
  * [[graft.functions.TaIndicators.realizedKernel]] and
  * [[graft.functions.TaIndicators.harRegression]] are exercised by the
  * query suite at sf0.1 tick counts only — this drives them at ×1/×10/
  * ×100 density on a deterministic synthetic tape and records:
  *
  *  - WALLS, proving the one-keyed-window + one-map-side-agg shape
  *    stays linear in ticks (no hidden quadratic, no extra exchange);
  *  - the DECIMAL/BIGINT moment ENVELOPE: the largest per-bucket
  *    quantized image each estimator accumulates vs its documented
  *    overflow contract (`n·r²·10¹² < 2⁶³` per bucket for TSRV/RK;
  *    `Σx² < 10³⁸` for HAR's Gram matrix) — measured, not assumed
  *    (the q_semivariance overflow lesson).
  *
  * `runMain graft.tools.RealizedVolRehearsal [densities]` — default
  * 1,10,100 × the 20k-ticks/series base (5 series, so the ×100 row is
  * 10M ticks through one window sort). */
object RealizedVolRehearsal {
  private def time[A](f: => A): (A, Double) = {
    val t0 = System.nanoTime(); val a = f
    (a, (System.nanoTime() - t0) / 1e9)
  }

  /** Deterministic tape: 5 series, `n` ticks each, spread over 14 days
    * so every estimator sees multiple buckets. Price = 100·exp(drifty
    * sine mix + hash micro-noise) — returns |r| ~ 1e-3 like a real
    * intraday tape, with the noise term exercising exactly the
    * microstructure channel TSRV/RK exist for. */
  private def tape(spark: SparkSession, n: Long): DataFrame = {
    val k = 5L
    val spanUs = 14L * 24 * 3600 * 1000000L
    spark.range(k * n).select(
        format_string("s%d", (col("id") % k).cast("int")).as("sym"),
        timestamp_micros((col("id") / k).cast("long") * lit(spanUs / n)
            + lit(1700000000000000L))
          .as("ts"),
        col("id").as("seq"),
        (lit(100.0) * exp(
          sin((col("id") / k).cast("double") * lit(6.28e-5)
              * ((col("id") % k) + lit(1)).cast("double")) * lit(0.05)
          + (pmod(xxhash64(col("id")), lit(2001)).cast("double") - 1000.0)
            * lit(1e-6))).as("price"))
  }

  def main(args: Array[String]): Unit = {
    val densities = if (args.nonEmpty) args(0).split(",").map(_.trim.toInt).toSeq
                    else Seq(1, 10, 100)
    val base = 20000L
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.functions.TaIndicators

    println("density | ticks/series | tsrv_s | rk_s | har_s | " +
      "max_bucket_rv_image | i64_headroom | har_max_gram | d38_headroom")
    densities.foreach { d =>
      val n = base * d
      val df = tape(spark, n).localCheckpoint()
      val (ts, wTs) = time(TaIndicators.twoScaleRV(df, Seq("sym"), "ts",
        "price", "seq").localCheckpoint())
      val (rk, wRk) = time(TaIndicators.realizedKernel(df, Seq("sym"), "ts",
        "price", "seq").localCheckpoint())
      val (har, wHar) = time(TaIndicators.harRegression(df, Seq("sym"), "ts",
        "price", "seq").localCheckpoint())
      // envelope: the largest quantized per-bucket image that actually
      // accumulated, vs the 2^63 contract. rv columns are images/1e12.
      val env = ts.agg(max(greatest(col("rv_all"), col("rv_avg"))))
        .collect()(0).getDouble(0)
      val imgMax = env * 1e12
      val head = 9.223372036854776e18 / math.max(1.0, imgMax)
      // HAR Gram envelope: x are rv images at regScale=1e6, Gram sums
      // n_obs·max(x)² per cell — measure from the hourly rv layer
      val rvh = TaIndicators.realizedMoments(df, Seq("sym"), "ts",
        "price", "seq", interval = "hour")
      val g = rvh.agg(max(col("rv")).as("mx"), count(lit(1)).as("nb"))
        .collect()(0)
      val gram = math.pow(g.getDouble(0) * 1e6, 2) * g.getLong(1)
      val gHead = 1e38 / math.max(1.0, gram)
      val nb = ts.count()
      println(f"x$d%-6d | $n%12d | $wTs%6.1f | $wRk%4.1f | $wHar%5.1f | " +
        f"$imgMax%.3e ($nb buckets) | $head%.1e | $gram%.3e | $gHead%.1e")
      require(head > 10.0,
        f"TSRV/RK image envelope headroom $head%.1e at density x$d — " +
          "the 2^63 contract is close to binding on this tape shape")
      require(gHead > 10.0,
        f"HAR Gram envelope headroom $gHead%.1e at density x$d")
      require(har.count() > 0 && rk.count() > 0)
    }
    spark.stop()
  }
}
