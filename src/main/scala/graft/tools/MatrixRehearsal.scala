package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Key-count rehearsal for the matrix family (VERDICT r11 #3): the
  * correlation/shrinkage estimators, the spectral + allocator solvers,
  * and the MST are exercised by the query suite at 5 series only — this
  * drives them at 64 and 256 keys (key² = 4k…65k pairs) on a synthetic
  * deterministic panel and records walls, plus numeric parity of the
  * quantized iterative allocators ([[graft.operators.Backtest
  * .minVarianceCG]], [[graft.operators.Backtest.ercIterative]]) against
  * the exact driver-side solves at every size.
  *
  * `runMain graft.tools.MatrixRehearsal [keyCounts]` — default 64,256;
  * also always runs the real LW-CC frame from `SPARK_GRAFT_SF_DIR`
  * (default sf0.01) as the 5-key row. */
object MatrixRehearsal {
  private def time[A](f: => A): (A, Double) = {
    val t0 = System.nanoTime(); val a = f
    (a, (System.nanoTime() - t0) / 1e9)
  }

  /** Deterministic synthetic panel: k series × t buckets, values a
    * fixed sine mix + hash noise — full-rank, vol spread ~8×. */
  private def panel(spark: SparkSession, k: Int, t: Int): DataFrame = {
    spark.range(k.toLong * t).select(
        format_string("s%03d", (col("id") % k).cast("int")).as("k"),
        (col("id") / k).cast("long").as("t"),
        (sin(col("id") % k * lit(0.7) + (col("id") / k).cast("double")
            * (lit(0.05) + (col("id") % k).cast("double") * lit(0.013)))
          * ((col("id") % k) % 8 + lit(1)).cast("double")
          + (pmod(xxhash64(col("id")), lit(1000)).cast("double") / 500.0 - 1.0)
          ).as("v"))
  }

  private def maxAbsDiff(a: DataFrame, b: DataFrame, keyCol: String,
                         valCol: String): Double = {
    val j = a.select(col(keyCol).as("k"), col(valCol).as("va"))
      .join(b.select(col(keyCol).as("k"), col(valCol).as("vb")), Seq("k"))
      .agg(max(abs(col("va") - col("vb")))).collect()(0)
    if (j.isNullAt(0)) Double.NaN else j.getDouble(0)
  }

  def main(args: Array[String]): Unit = {
    val ks = if (args.nonEmpty) args(0).split(",").map(_.trim.toInt).toSeq
             else Seq(64, 256)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.operators.{Backtest, Relational}

    def drive(tag: String, lw: DataFrame): Unit = {
      val cov = lw.localCheckpoint()
      val (_, wEig) = time(Backtest.leadingEigen(cov, "shrunk_cov", 8).count())
      val (wcg, wCg) = time(Backtest.minVarianceCG(cov, rounds = 16)
        .localCheckpoint())
      val (wex, wEx) = time(Backtest.minVariancePortfolio(cov)
        .localCheckpoint())
      val dMv = maxAbsDiff(wcg, wex, "key", "weight")
      val (ei, wEi) = time(Backtest.ercIterative(cov).localCheckpoint())
      val (ee, wEe) = time(Backtest.ercPortfolio(cov).localCheckpoint())
      val dErc = maxAbsDiff(ei, ee, "key", "weight")
      // corr-distance MST over the same pair frame (auto-derived rounds)
      val dist = cov.where(col("key_a") =!= col("key_b"))
        .join(cov.where(col("key_a") === col("key_b"))
          .select(col("key_a").as("key_a"), col("shrunk_cov").as("va")),
          Seq("key_a"))
        .join(cov.where(col("key_a") === col("key_b"))
          .select(col("key_a").as("key_b"), col("shrunk_cov").as("vb")),
          Seq("key_b"))
        .select(col("key_a"), col("key_b"),
          sqrt((lit(1.0) - col("shrunk_cov") / sqrt(col("va") * col("vb")))
            / 2.0).as("dist"))
      val ((mstN, _), wMst) = time {
        val m = Relational.minSpanningTree(dist); (m.count(), m)
      }
      println(f"$tag%-10s eigen=$wEig%6.1fs  minvarCG=$wCg%6.1fs (exact=$wEx%5.1fs, maxΔw=$dMv%.2e)  " +
        f"ercIter=$wEi%6.1fs (exact=$wEe%5.1fs, maxΔw=$dErc%.2e)  mst=$wMst%6.1fs ($mstN%d edges)")
      // Black–Litterman: walls at k keys + the uplift=0 ≡ market-prior
      // identity (z = 0 ⇒ μ = Π ⇒ w = w_mkt up to the CG quantization
      // floor) as the numeric parity check
      val kw = org.apache.spark.sql.expressions.Window.orderBy(col("k"))
      val ksf = cov.where(col("key_a") === col("key_b"))
        .select(col("key_a").cast("string").as("k"))
        .withColumn("rn", row_number().over(kw))
      val views = ksf.where(col("rn") === 1)
        .select(lit(1).as("view_id"), col("k").as("key"), lit(1000000L).as("pq"))
        .unionByName(ksf.where(col("rn") === 2)
          .select(lit(1).as("view_id"), col("k").as("key"), lit(-1000000L).as("pq")))
        .unionByName(ksf.where(col("rn") === 3)
          .select(lit(2).as("view_id"), col("k").as("key"), lit(1000000L).as("pq")))
        .localCheckpoint()
      val (_, wBl) = time(Backtest.blackLitterman(cov, views)
        .localCheckpoint())
      val (bl0, _) = time(Backtest.blackLitterman(cov, views, uplift = 0.0)
        .localCheckpoint())
      val dq = cov.where(col("key_a") === col("key_b"))
        .select(col("key_a").cast("string").as("key"),
          round(col("shrunk_cov") * 1e6).cast("long").as("dq"))
      val dmin = dq.agg(min(col("dq"))).collect()(0).getLong(0)
      val iv = dq.select(col("key"),
        round(lit(1e6) * lit(dmin.toDouble) / col("dq").cast("double"))
          .cast("long").as("ivq"))
      val sIv = iv.agg(sum(col("ivq"))).collect()(0).getLong(0)
      val ivp = iv.select(col("key"),
        (col("ivq").cast("double") / lit(sIv.toDouble)).as("weight"))
      val dBl = maxAbsDiff(bl0, ivp, "key", "weight")
      println(f"$tag%-10s blackLitterman=$wBl%6.1fs (uplift0 vs market prior maxΔw=$dBl%.2e)")
    }

    // 5-key row: the real LW-CC frame from the events table
    val hourly = spark.read.parquet(s"$sfDir/events.parquet")
      .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("bucket"))
      .agg((sum(col("value").cast("decimal(18,2)")).cast("double")
        / count(lit(1))).as("mean_v"))
    val (lwReal, wLwReal) = time(Relational.ledoitWolfConstCorr(hourly,
      "event_type", "bucket", "mean_v", scale = 1e4, pairScale = 1e2,
      termScale = 1e6).localCheckpoint())
    println(f"lwcc(sf)   estimator=$wLwReal%6.1fs")
    drive("real-5", lwReal)

    ks.foreach { k =>
      val p = panel(spark, k, 512).localCheckpoint()
      val (corrN, wCorr) = time(
        Relational.correlationMatrix(p, "k", "t", "v", scale = 1e4).count())
      val (lw, wLw) = time(Relational.ledoitWolfConstCorr(p, "k", "t", "v",
        scale = 1e4, pairScale = 1e2, termScale = 1e6).localCheckpoint())
      println(f"k=$k%-4d corr=$wCorr%6.1fs ($corrN%d pairs)  lwcc=$wLw%6.1fs")
      drive(s"synth-$k", lw)
    }
    spark.stop()
  }
}
