package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Time-bucket resampling — the reference's pandas `resample(...)`
  * (`adi/scripts/build_training_matrix.py:70-82`, A5) and the bar-building
  * "resample last + ffill" trick (`HistoricalDataTest.py:53-58`, W31),
  * expressed as tumbling-window aggregations.
  *
  * One shuffle on (keys, bucket); partial aggregation (map-side combine)
  * happens automatically for all algebraic aggregates used here, so at
  * 100 TB the shuffle carries one row per (series, bucket), not per event.
  */
object Resample {

  /** Tumbling bucket start for a timestamp, e.g. "1 hour", "1 day". */
  def bucket(ts: Column, interval: String): Column =
    window(ts, interval).getField("start")

  /** Mean + count per tumbling bucket — `resample(tf).mean()` / `.count()`
    * (`build_training_matrix.py:70-82`). */
  def resampleAgg(df: DataFrame, tsCol: String, interval: String, keys: Seq[String],
                  valueCol: String, idCol: String): DataFrame =
    df.withColumn("bucket", bucket(col(tsCol), interval))
      .groupBy((keys :+ "bucket").map(col): _*)
      .agg(avg(col(valueCol)).as(s"${valueCol}_mean"), count(col(idCol)).as("count"))

  /** OHLCV bars from a tick/event stream: per (keys, bucket) —
    * open = value at min ts, close = value at max ts, high/low = max/min,
    * volume = sum. Deterministic even with duplicate timestamps via the
    * (ts, tiebreak) composite ordering key of min_by/max_by.
    * `exactVolume` routes the sum through DECIMAL(18,2) — exact and
    * order-independent, so results are reproducible across partitionings
    * and engines (the bench/oracle path uses it). */
  def bars(df: DataFrame, tsCol: String, valueCol: String, tiebreakCol: String,
           interval: String, keys: Seq[String], exactVolume: Boolean = false): DataFrame = {
    val ord = struct(col(tsCol), col(tiebreakCol))
    val vol =
      if (exactVolume) sum(col(valueCol).cast(org.apache.spark.sql.types.DecimalType(18, 2))).cast("double")
      else sum(col(valueCol))
    df.withColumn("bar_ts", bucket(col(tsCol), interval))
      .groupBy((keys :+ "bar_ts").map(col): _*)
      .agg(
        min_by(col(valueCol), ord).as("open"),
        max(col(valueCol)).as("high"),
        min(col(valueCol)).as("low"),
        max_by(col(valueCol), ord).as("close"),
        vol.as("volume"),
        count(lit(1)).as("n_ticks"))
  }
}
