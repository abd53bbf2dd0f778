package graft.features

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.{windows => W}
import graft.operators.Resample

/** Offline training-matrix builder — the §3.3 flow
  * (`adi/scripts/build_training_matrix.py`): market features ⟕ close,
  * optional resampled social/news aggregates, lead labels, zero-fills.
  * One lazy end-to-end plan; the reference's 200-file cap (O5) is dropped
  * — Spark lists and splits the lake natively.
  */
object TrainingMatrix {

  /** Lead labels (W4, `build_training_matrix.py:85-89`): `ret_next` is the
    * next row's pct-change; `y_dir = ret_next > 0`; rows without a next
    * observation are dropped. */
  def withLabels(df: DataFrame, retCol: String, keys: Seq[String],
                 order: Seq[String]): DataFrame = {
    val w = W.series(keys, order)
    df.withColumn("ret_next", lead(col(retCol), 1).over(w))
      .filter(col("ret_next").isNotNull)
      .withColumn("y_dir", (col("ret_next") > 0).cast("long"))
  }

  /** Full matrix: features ⟕ close (J1 — the reference joins on timestamp
    * alone because each frame holds ONE series, `build_training_matrix
    * .py:108`; multi-series requires the series keys in the join), then
    * each resampled aggregate frame ⟕ on its bucket keys (J2) with the
    * reference's fills — counts → 0, sentiment means → 0.0
    * (`build_training_matrix.py:155-159`). */
  def build(features: DataFrame, market: DataFrame, marketJoinKeys: Seq[String],
            aggs: Map[String, DataFrame], aggJoinKeys: Seq[String],
            labelKeys: Seq[String], labelOrder: Seq[String]): DataFrame = {
    val base = features.join(
      market.select((marketJoinKeys.map(col) :+ col("close")): _*), marketJoinKeys, "left")
    val joined = aggs.foldLeft(base) { case (acc, (prefix, agg)) =>
      val renamed = agg.columns.foldLeft(agg) { (d, c) =>
        if (aggJoinKeys.contains(c)) d else d.withColumnRenamed(c, s"${prefix}_$c")
      }
      acc.join(renamed, aggJoinKeys, "left")
    }
    val fills = aggs.keys.flatMap(p =>
      Seq(s"${p}_count" -> 0L, s"${p}_sent_mean" -> 0.0)).toMap
    val countFills = fills.collect { case (k, v: Long) if joined.columns.contains(k) => k -> v }
    val doubleFills = fills.collect { case (k, v: Double) if joined.columns.contains(k) => k -> v }
    val filled = joined.na.fill(countFills).na.fill(doubleFills)
    withLabels(filled, "ret_1", labelKeys, labelOrder)
  }
}
