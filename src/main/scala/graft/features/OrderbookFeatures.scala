package graft.features

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{windows => W}
import graft.operators.Relational

/** Order-book feature set — Spark re-expression of
  * `adi/app/features/processors/orderbook_features.py` (A1–A4, W29/W30,
  * J4). Input: the long snapshot frame `[ts, price, amount, side]`
  * (+ optional symbol/exchange keys).
  *
  * The reference's numba kernels (`_imbalance_nb`, `_batch_orderbook_nb`)
  * are elementwise — whole-stage codegen fuses the same arithmetic after
  * the pivot, so each series below is one shuffle on `ts` (or one on
  * (ts, side) for depth) followed by pure projections.
  */
object OrderbookFeatures {

  /** Imbalance per ts: (bid_vol − ask_vol)/(bid_vol + ask_vol), 0 when the
    * total is 0 (`orderbook_features.py:94-118`, W29). */
  def imbalanceSeries(df: DataFrame): DataFrame = {
    val pivot = Relational.pivotSum(df, Seq("ts"), "side", Seq("bid", "ask"), "amount")
    val total = col("bid") + col("ask")
    pivot.select(col("ts"),
      when(total =!= 0, (col("bid") - col("ask")) / total).otherwise(0.0).as("imbalance"))
  }

  /** Spread per ts: best ask − best bid with as-of forward-fill of missing
    * asks onto the bid axis, 0-filled (`orderbook_features.py:121-137`,
    * A3 + J4). */
  def spreadSeries(df: DataFrame): DataFrame = {
    val bestBid = df.filter(col("side") === "bid")
      .groupBy("ts").agg(max("price").as("best_bid"))
    val bestAsk = df.filter(col("side") === "ask")
      .groupBy("ts").agg(min("price").as("best_ask"))
    val aligned = bestBid.join(bestAsk, Seq("ts"), "left")
    val w = Window.orderBy("ts")
    aligned
      .withColumn("best_ask_ff", W.ffill(col("best_ask"), w))
      .select(col("ts"),
        coalesce(col("best_ask_ff") - col("best_bid"), lit(0.0)).as("spread"))
  }

  /** Top-N depth per ts, wide: bid levels by price desc, ask levels asc →
    * `bid_depth_1..n` / `ask_depth_1..n` (`orderbook_features.py:140-157`,
    * A4 as row_number + pivot — one shuffle, no per-group apply). */
  def depthSeries(df: DataFrame, nLevels: Int = 5): DataFrame = {
    val ranked = df.withColumn("rn", row_number().over(
      Window.partitionBy(col("ts"), col("side"))
        .orderBy(when(col("side") === "bid", -col("price")).otherwise(col("price")))))
      .filter(col("rn") <= nLevels)
    val labeled = ranked.withColumn("slot", concat(col("side"), lit("_depth_"), col("rn")))
    val slots = (1 to nLevels).flatMap(i => Seq(s"bid_depth_$i", s"ask_depth_$i"))
    labeled.groupBy("ts").pivot("slot", slots).agg(first("amount"))
  }

  /** Fused imbalance + spread per ts (`compute_batch_orderbook`,
    * `orderbook_features.py:163-186`): volume pivot-sum + first-price
    * pivot with forward-fill; spread = ask_price − bid_price after ffill. */
  def batchFeatures(df: DataFrame): DataFrame = {
    val vol = Relational.pivotSum(df, Seq("ts"), "side", Seq("bid", "ask"), "amount")
      .withColumnRenamed("bid", "bid_vol").withColumnRenamed("ask", "ask_vol")
    // pivot first-price deterministically: price at the min (price asc for
    // ask, desc for bid would be "best"; the reference takes first row per
    // group, which for ccxt payloads is the best level)
    val price = df.groupBy("ts").pivot("side", Seq("bid", "ask"))
      .agg(first("price"))
      .withColumnRenamed("bid", "bid_price").withColumnRenamed("ask", "ask_price")
    val w = Window.orderBy("ts")
    val joined = vol.join(price, Seq("ts"), "left")
      .withColumn("bid_price_ff", W.ffill(col("bid_price"), w))
      .withColumn("ask_price_ff", W.ffill(col("ask_price"), w))
    val total = col("bid_vol") + col("ask_vol")
    joined.select(col("ts"),
      when(total =!= 0, (col("bid_vol") - col("ask_vol")) / total).otherwise(0.0)
        .as("imbalance"),
      (col("ask_price_ff") - col("bid_price_ff")).as("spread"))
  }
}
