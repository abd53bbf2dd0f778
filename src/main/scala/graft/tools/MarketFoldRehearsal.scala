package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.features.MarketFeatures
import graft.operators.MarketIncremental

/** Long-history rehearsal for the chunked market-feature fold (the
  * round-8 verdict's lead item): the one-shot
  * [[MarketFeatures.build]] sorts each series' WHOLE history inside one
  * partition, so per-series memory grows with the span; the fold
  * ([[MarketIncremental.marketFeaturesFold]]) must show per-fold walls
  * FLAT in the number of already-folded chunks — the carried state is
  * O(1)/series (3 EWM doubles, last close, OBV sum, ≤19 logrets,
  * ≤13 deltas), so fold k over a year of history must cost the same as
  * fold 1.
  *
  * Two spans at a FIXED chunk size (the 100 TB shape: chunk = one
  * ingestion batch): a short span (few folds) and a 10× span (10× the
  * folds). The claim passes when the long span's late-fold walls match
  * its early-fold walls and the short span's mean — per-fold cost is a
  * function of the CHUNK, never of accumulated history. Honest `toRdd`
  * materialization per fold (the fold itself also eagerly
  * localCheckpoints, so guard+window lineage is paid inside the timed
  * region).
  *
  * Usage: `runMain graft.tools.MarketFoldRehearsal` (env
  * `SPARK_GRAFT_MFR_ROWS` = rows/series at the short span, default
  * 150000; long span is 10×; `SPARK_GRAFT_MFR_CHUNK` = rows/series per
  * chunk, default 50000). Prints one stderr line per fold and a final
  * JSON line on stdout for BASELINE.md. */
object MarketFoldRehearsal {
  def main(args: Array[String]): Unit = {
    val rowsShort = sys.env.getOrElse("SPARK_GRAFT_MFR_ROWS", "150000").toLong
    val chunkRows = sys.env.getOrElse("SPARK_GRAFT_MFR_CHUNK", "50000").toLong
    val nSeries = 4
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_GRAFT_MASTER", "local[32]"))
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val hourUs = 3600000000L
    def mkBars(rowsPerSeries: Long, path: String): Unit =
      spark.range(rowsPerSeries * nSeries)
        .select(
          concat(lit("S"), (col("id") % nSeries).cast("string")).as("symbol"),
          lit("x").as("exchange"), lit("1h").as("timeframe"),
          expr(s"timestamp_micros((id div $nSeries) * $hourUs)").as("timestamp"),
          expr(s"id div $nSeries").as("t"))
        .withColumn("close", round(lit(100.0) + col("t") % 977 * 0.11
          + sin(col("t").cast("double") / 7.0) * 9.0, 2))
        .withColumn("open", col("close"))
        .withColumn("high", col("close") + 1.0)
        .withColumn("low", col("close") - 1.0)
        .withColumn("volume", lit(5.0) + col("t") % 13)
        .drop("t")
        .repartition(32)
        .write.mode("overwrite").parquet(path)

    def timed[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f; (r, (System.nanoTime() - t0) / 1e9)
    }
    def mat(df: DataFrame): Long = df.queryExecution.toRdd.count()

    val cfg = MarketIncremental.FeatCfg(MarketFeatures.seriesKeys, "timestamp")
    val chunkUs = chunkRows * hourUs

    def run(label: String, rowsPerSeries: Long): Map[String, Any] = {
      val path = s"target/rehearsal/market_bars_$label"
      mkBars(rowsPerSeries, path)
      val bars = spark.read.parquet(path)
      val (oneShotRows, oneShotWall) = timed(mat(MarketFeatures.build(bars)))
      System.err.println(f"[mfr] $label one-shot: $oneShotRows rows in $oneShotWall%.1f s")
      val base = bars.withColumn("_chunk",
        expr(s"(unix_micros(timestamp) - pmod(unix_micros(timestamp), ${chunkUs}L)) div ${chunkUs}L"))
        .localCheckpoint(true)
      val chunkIds = base.select(col("_chunk")).distinct()
        .orderBy(col("_chunk")).collect().map(_.getLong(0)).toSeq
      var carry = MarketIncremental.emptyFeatCarry(spark, cfg)
      var total = 0L
      val walls = chunkIds.map { c =>
        val ((rows, c2), wall) = timed {
          val (feat, carry2) = MarketIncremental.marketFeaturesFold(
            carry, base.where(col("_chunk") === c).drop("_chunk"), cfg)
          (mat(feat), carry2)
        }
        carry = c2
        total += rows
        System.err.println(f"[mfr] $label fold $c: $rows rows in $wall%.2f s")
        wall
      }
      require(total == oneShotRows,
        s"fold emitted $total rows, one-shot $oneShotRows — equivalence broken")
      val tail = walls.drop(1) // fold 0 is JIT-inflated
      Map("label" -> label, "rows_per_series" -> rowsPerSeries,
        "folds" -> walls.size, "one_shot_s" -> math.rint(oneShotWall * 100) / 100,
        "fold_first_s" -> math.rint(walls.head * 100) / 100,
        "fold_mean_tail_s" -> math.rint(tail.sum / tail.size * 100) / 100,
        "fold_last_s" -> math.rint(walls.last * 100) / 100,
        "rows" -> total)
    }

    val short = run("x1", rowsShort)
    val long = run("x10", rowsShort * 10)
    def j(m: Map[String, Any]) = m.map {
      case (k, v: String) => s""""$k":"$v""""
      case (k, v) => s""""$k":$v"""
    }.mkString("{", ",", "}")
    println(s"""{"rehearsal":"market_fold","chunk_rows":$chunkRows,"series":$nSeries,"short":${j(short)},"long":${j(long)}}""")
    spark.stop()
  }
}
