package graft.jobs

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.features.MarketFeatures
import graft.store.FeatureStore
import graft.time.TimeNorm

/** Gap-detect-and-fill job — `adi/app/features/jobs/backfill.py` (ST5).
  *
  * The reference plans a Python list of expected epochs and batch-reads
  * Redis key-by-key (`backfill.py:45-76`); here the expected grid is a
  * `sequence()` expression and the "which keys are missing" step is a
  * left-anti join against the pruned feature table — fully distributed,
  * no driver-side loop, no per-key round trips.
  */
object Backfill {

  final case class Plan(symbol: String, timeframe: String,
                        expected: Long, missing: DataFrame)

  /** Expected grid [floor(end), …, floor(end) − lookback] at the timeframe
    * step, minus what the store already has → missing epochs
    * (`plan_missing_market_keys`, `backfill.py:45-76`; J3).
    *
    * The grid is anchored at the FLOORED end and steps down (matching the
    * reference's end-anchored loop, `backfill.py:56-61`): anchoring at
    * `end − lookback` puts every grid point off the step boundary whenever
    * the lookback isn't a multiple of the timeframe step — all slots then
    * read as missing and the floor-aligned fill never matches them. */
  def planMissing(spark: SparkSession, store: FeatureStore, symbol: String,
                  timeframe: String, lookbackMinutes: Int,
                  nowEpochSec: Long): Plan = {
    val step = TimeNorm.timeframeSeconds(timeframe)
    val end = nowEpochSec - (nowEpochSec % step)
    val nSteps = lookbackMinutes * 60L / step + 1
    val grid = spark.range(0, nSteps)
      .select(timestamp_seconds(lit(end) - col("id") * step).as("timestamp"))
    val stored = store
      .rangeRead("market", symbol, timeframe, end - (nSteps - 1) * step, end,
        limit = Int.MaxValue)
      .select("timestamp")
    val missing = grid.join(stored, Seq("timestamp"), "left_anti")
    Plan(symbol, timeframe, nSteps, missing)
  }

  /** Fill: fetch OHLCV covering the missing range (connector-supplied),
    * align each bar's ts with `floor_epoch` (`backfill.py:134-145`), keep
    * only bars whose aligned ts is in the missing set (P5 membership as a
    * broadcast semi join), build features, upsert
    * (`backfill_market_once`, `backfill.py:112-155`).
    *
    * `writeSeq` stamps the upsert (see [[FeatureStore.upsert]]'s
    * idempotency contract): pass the plan's anchor epoch so a replay of
    * the same planned fill is a no-op. */
  def fillOnce(spark: SparkSession, store: FeatureStore, plan: Plan,
               fetch: (Long, Long) => DataFrame,
               writeSeq: Long): Map[String, Long] = {
    import org.apache.spark.sql.Row
    val bounds = plan.missing.agg(
      min(unix_timestamp(col("timestamp"))), max(unix_timestamp(col("timestamp"))))
      .head()
    if (bounds.isNullAt(0)) return Map("expected" -> plan.expected, "missing" -> 0L, "written" -> 0L)
    val (lo, hi) = (bounds.getLong(0), bounds.getLong(1))
    // materialize the plan BEFORE upserting: the missing-set plan reads the
    // store's current files, which the upsert below replaces
    val missingCount = plan.missing.count()
    val step = TimeNorm.timeframeSeconds(plan.timeframe)
    val fetched = fetch(lo, hi)
    val aligned = fetched.withColumn("timestamp",
      timestamp_seconds(TimeNorm.floorEpoch(unix_timestamp(col("timestamp")), step)))
    val onlyMissing = aligned.join(broadcast(plan.missing), Seq("timestamp"), "left_semi")
    val feats = MarketFeatures.build(onlyMissing).cache()
    val written = feats.count() // also pins feats before the store files change
    if (written > 0) store.upsert(feats, "market", writeSeq)
    feats.unpersist()
    Map("expected" -> plan.expected, "missing" -> missingCount, "written" -> written)
  }
}
