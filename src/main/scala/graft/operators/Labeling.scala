package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Training-label generation for market series — the step between the
  * feature factory (`graft.features`) and a supervised dataset. The
  * reference builds naive fixed-horizon forward-return labels
  * (`adi/scripts/build_training_matrix.py` lead columns, W4); the
  * triple-barrier method is the standard upgrade: a label that reflects
  * WHICH exit a trade would actually have taken.
  */
object Labeling {

  /** Triple-barrier labels (López de Prado AFML ch. 3): for every
    * observation (entry) at price p₀, scan forward up to `horizonUs`;
    * label +1 if price first touches the upper barrier `p₀·(1+upPct)`,
    * −1 if it first touches the lower `p₀·(1−dnPct)`, 0 if neither does
    * before the time barrier. Ties (both barriers touched at the same
    * earliest µs by different ticks) resolve UP — a fixed documented
    * rule, not engine chance.
    *
    * Determinism: barrier prices are one IEEE multiply per entry (the
    * identical double tree on any engine), touch times aggregate as
    * exact integer-µs MINs, and the label is a fixed conditional over
    * them.
    *
    * Scale shape: one keyed equi-join (series key) with a bounded range
    * predicate — each entry fans out to at most the ticks inside its own
    * horizon (horizon × tick rate, a per-series constant, not corpus²);
    * the touch-time agg collapses it straight back to one row per entry.
    * Spark 4.1 plans this as a SortMergeJoin on the key with the range
    * as residual condition; MEASURED linear 100k → 10M events
    * (0.2 s → 1.3 s, 2M rows in one key group — BASELINE.md market
    * rehearsal, independently reproduced by the round-6 review). See the
    * [[TemporalJoins]] header for when a band join is NOT safe (the
    * one-sided/unbounded as-of shape). At 100 TB bucket both sides by
    * the series key to co-locate the join.
    *
    * Returns one row per entry: `(keys…, ts_us, price, t_up_us,
    * t_dn_us, label)` — touch times null when that barrier was never
    * hit inside the horizon. */
  def tripleBarrier(df: DataFrame, keys: Seq[String], tsCol: String,
                    priceCol: String, idCol: String, horizonUs: Long,
                    upPct: Double, dnPct: Double): DataFrame = {
    require(keys.nonEmpty,
      "tripleBarrier needs the series key(s) — for a genuinely single-" +
        "series frame add a literal key column (an empty key set would " +
        "cross every entry against every tick)")
    require(horizonUs > 0L, s"horizon must be positive, got $horizonUs")
    require(upPct > 0.0 && dnPct > 0.0 && dnPct < 1.0,
      s"need upPct > 0 and 0 < dnPct < 1, got $upPct/$dnPct")
    val base = df.select(
      (keys.map(col) :+ unix_micros(col(tsCol).cast("timestamp")).as("ts_us")
        :+ col(priceCol).cast("double").as("price")
        :+ col(idCol).as("_id")): _*)
    val entries = base.select(
      (keys.map(k => col(k).as(s"_e_$k")) :+ col("ts_us").as("_e_ts")
        :+ col("price").as("_e_p") :+ col("_id").as("_e_id")): _*)
    val joinCond = keys.map(k => col(s"_e_$k") === col(k))
      .reduce(_ && _) &&
      col("ts_us") > col("_e_ts") &&
      col("ts_us") <= col("_e_ts") + lit(horizonUs)
    val up = col("price") >= col("_e_p") * lit(1.0 + upPct)
    val dn = col("price") <= col("_e_p") * lit(1.0 - dnPct)
    val hits = entries.join(base, joinCond)
      .groupBy((keys.map(k => col(s"_e_$k")) :+ col("_e_ts") :+ col("_e_id")): _*)
      .agg(min(when(up, col("ts_us"))).as("t_up_us"),
        min(when(dn, col("ts_us"))).as("t_dn_us"))
    val joined = entries.join(hits,
      keys.map(k => s"_e_$k") :+ "_e_ts" :+ "_e_id", "left")
    joined.select(
      (keys.map(k => col(s"_e_$k").as(k)) :+ col("_e_ts").as("ts_us")
        :+ col("_e_p").as("price") :+ col("t_up_us") :+ col("t_dn_us")
        :+ when(col("t_up_us").isNotNull &&
            (col("t_dn_us").isNull || col("t_up_us") <= col("t_dn_us")), lit(1L))
          .when(col("t_dn_us").isNotNull, lit(-1L))
          .otherwise(lit(0L)).as("label")): _*)
  }
}
