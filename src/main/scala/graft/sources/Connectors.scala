package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.time.TimeNorm
import graft.types.Schemas

/** Connector layer (SURVEY §2.1 S1–S11). The reference's adapters do two
  * things: a driver-side HTTP fetch and a normalization of the raw payload
  * into a canonical frame. The fetch is an app-level concern (and stays
  * driver-side in the reference too); the REAL data-plane content is the
  * normalization — implemented here as `DataFrame => DataFrame` over raw
  * JSON records (in tests: `spark.read.json` fixtures; in production:
  * whatever ingestion edge lands the payloads).
  *
  * Error contract kept from the reference: malformed/empty payloads yield
  * a schema-stable empty frame, never an exception
  * (e.g. `adi/app/adapters/reddit_adapter.py:57-69`).
  */
object Connectors {

  /** Normalizes one external payload shape into one canonical domain. */
  trait Connector {
    def domain: String
    def normalize(raw: DataFrame): DataFrame
  }

  private def emptyOf(spark: SparkSession, schema: StructType): DataFrame =
    spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)

  private def conformWithDt(df: DataFrame, schema: StructType, tsCol: String): DataFrame =
    Schemas.conformTo(df.withColumn("dt", TimeNorm.dt(col(tsCol))), schema, keepExtra = false)

  /** CCXT OHLCV (S1, `adi/app/adapters/ccxt_adapter.py:77-113`): raw rows
    * `[ts_ms, open, high, low, close, volume]` as an array column named
    * `ohlcv`, stamped with (symbol, exchange, timeframe). */
  case class CcxtOhlcv(symbol: String, exchange: String, timeframe: String) extends Connector {
    val domain = "market"
    def normalize(raw: DataFrame): DataFrame = {
      if (!raw.columns.contains("ohlcv")) return emptyOf(raw.sparkSession, Schemas.MARKET)
      val cols = Seq("timestamp", "open", "high", "low", "close", "volume")
      val parsed = raw.select(explode(col("ohlcv")).as("r"))
        .select(timestamp_millis(col("r").getItem(0).cast("long")).as("timestamp") +:
          (1 to 5).map(i => col("r").getItem(i).cast("double").as(cols(i))): _*)
        .withColumn("symbol", lit(symbol))
        .withColumn("exchange", lit(exchange))
        .withColumn("timeframe", lit(timeframe))
      conformWithDt(parsed, Schemas.MARKET, "timestamp")
    }
  }

  /** CCXT order-book snapshot (S2, `ccxt_adapter.py:115-149`): bids+asks
    * arrays → unioned long frame stamped with the snapshot time. */
  case class CcxtOrderBook(symbol: String, exchange: String,
                           snapshotMillis: Long) extends Connector {
    val domain = "orderbook"
    def normalize(raw: DataFrame): DataFrame = {
      if (!raw.columns.contains("bids") && !raw.columns.contains("asks"))
        return emptyOf(raw.sparkSession, Schemas.ORDERBOOK)
      def side(name: String, label: String): DataFrame =
        raw.select(explode(col(name)).as("level"))
          .select(col("level").getItem(0).cast("double").as("price"),
            col("level").getItem(1).cast("double").as("amount"))
          .withColumn("side", lit(label))
      val long = side("bids", "bid").unionByName(side("asks", "ask"))
        .withColumn("timestamp", timestamp_millis(lit(snapshotMillis)))
        .withColumn("symbol", lit(symbol))
        .withColumn("exchange", lit(exchange))
      Schemas.conformTo(long, Schemas.ORDERBOOK, keepExtra = false)
    }
  }

  /** Glassnode time series (S5, `adi/app/adapters/onchain_adapter.py:32-94`):
    * `[t, v]` points (ms epoch) → onchain frame. */
  case class Glassnode(symbol: String, metric: String) extends Connector {
    val domain = "onchain"
    def normalize(raw: DataFrame): DataFrame = {
      if (!raw.columns.contains("points")) return emptyOf(raw.sparkSession, Schemas.ONCHAIN)
      val parsed = raw.select(explode(col("points")).as("p"))
        .select(timestamp_millis(col("p").getItem(0).cast("long")).as("timestamp"),
          col("p").getItem(1).cast("double").as("value"))
        .withColumn("source", lit("glassnode"))
        .withColumn("symbol", lit(symbol))
        .withColumn("metric", lit(metric))
      conformWithDt(parsed, Schemas.ONCHAIN, "timestamp")
    }
  }

  /** Covalent balances (S6, `onchain_adapter.py:96-163`): token items with
    * decimal scaling `balance / 10^decimals`; null-decimals → null value. */
  case class Covalent(snapshotMillis: Long) extends Connector {
    val domain = "onchain"
    def normalize(raw: DataFrame): DataFrame = {
      if (!raw.columns.contains("items")) return emptyOf(raw.sparkSession, Schemas.ONCHAIN)
      val parsed = raw.select(explode(col("items")).as("t"))
        .select(
          coalesce(col("t.contract_ticker_symbol"), lit("")).as("symbol"),
          when(col("t.contract_decimals").isNotNull,
            col("t.balance").cast("double") / pow(lit(10.0), col("t.contract_decimals")))
            .as("value"),
          coalesce(col("t.contract_address"), lit("")).as("contract_address"),
          coalesce(col("t.contract_name"), lit("")).as("contract_name"))
        .withColumn("source", lit("covalent"))
        .withColumn("metric", lit("balance"))
        .withColumn("timestamp", timestamp_millis(lit(snapshotMillis)))
      conformWithDt(parsed, Schemas.ONCHAIN, "timestamp")
    }
  }

  /** Reddit listing (S7/S8, `adi/app/adapters/reddit_adapter.py:38-163`):
    * `data.children[].data` posts → social frame (epoch-seconds
    * `created_utc`, nullable counters). */
  case object Reddit extends Connector {
    val domain = "social"
    def normalize(raw: DataFrame): DataFrame = {
      if (!raw.columns.contains("data")) return emptyOf(raw.sparkSession, Schemas.SOCIAL)
      val posts = raw.select(explode(col("data.children")).as("c"))
        .select(col("c.data.*"))
      val parsed = posts.select(
        timestamp_seconds(col("created_utc").cast("long")).as("ts"),
        col("author").cast("string").as("author"),
        col("title").cast("string").as("title"),
        col("selftext").cast("string").as("selftext"),
        col("score").cast("long").as("score"),
        col("num_comments").cast("long").as("num_comments"),
        col("id").cast("string").as("id"),
        col("subreddit").cast("string").as("subreddit"))
        .withColumn("source", lit("reddit"))
      conformWithDt(parsed, Schemas.SOCIAL, "ts")
    }
  }

  /** Twitter search w/ sentiment scores (S9,
    * `adi/app/adapters/sentiment_adapter.py:81-155`). Tweets are scored at
    * ingest (U3): payloads that already carry model probabilities
    * (`p_pos`/`p_neg`) use them directly; otherwise the text runs through
    * the [[graft.operators.SentimentScorer]] inference stage — batched
    * per-partition model calls, mirroring the reference's per-tweet
    * pipeline invocation (`sentiment_adapter.py:132`,
    * `ml_utils.py:56-61`). The signed-score normalization
    * `clamp(p_pos − p_neg)` and 0.4/0.6 3-class margins
    * (`adi/app/ingestion_service/ml_utils.py:34-54`) are plain columns. */
  case class TwitterSentiment(
      model: graft.operators.SentimentScorer.Model =
        graft.operators.SentimentScorer.LexiconStub) extends Connector {
    val domain = "social"
    def normalize(raw: DataFrame): DataFrame = {
      if (!raw.columns.contains("tweets")) return emptyOf(raw.sparkSession, Schemas.SOCIAL)
      val tw = raw.select(explode(col("tweets")).as("t")).select(col("t.*"))
      // both probabilities must be present; a payload carrying only one
      // is unscored and falls back to the inference stage
      val hasProbs = tw.columns.contains("p_pos") && tw.columns.contains("p_neg")
      val baseCols = Seq(
        to_timestamp(col("created_at")).as("ts"),
        col("id").cast("string").as("id"),
        col("text").cast("string").as("text"),
        col("author_id").cast("string").as("author"),
        col("retweets").cast("long").as("retweets"),
        col("likes").cast("long").as("likes")) ++
        (if (hasProbs) Seq(col("p_pos"), col("p_neg")) else Nil)
      val base = tw.select(baseCols: _*)
      val scored =
        if (hasProbs)
          base.withColumn("sentiment_score",
            sentimentSigned(col("p_pos"), col("p_neg")))
        else
          graft.operators.SentimentScorer.withSentiment(base, "text", model)
      val parsed = scored
        .withColumn("source", lit("twitter"))
      conformWithDt(parsed, Schemas.SOCIAL, "ts")
    }
  }

  /** U3 normalization: signed score in [-1, 1]. */
  def sentimentSigned(pPos: Column, pNeg: Column): Column =
    graft.operators.SentimentScorer.sentimentSigned(pPos, pNeg)

  /** U3 3-class label at the 0.4/0.6 margins. */
  def sentimentLabel(pPos: Column): Column =
    graft.operators.SentimentScorer.sentimentLabel(pPos)

  /** News REST (S10, `adi/app/adapters/news_adapter.py:40-136`) and the
    * one-shot RSS batch (S11, `adi/scripts/rss_to_parquet.py:20-45`):
    * articles → news frame; RSS adds dedupe-by-id downstream. */
  case class News(sourceName: String) extends Connector {
    val domain = "news"
    def normalize(raw: DataFrame): DataFrame = {
      if (!raw.columns.contains("articles")) return emptyOf(raw.sparkSession, Schemas.NEWS)
      val art = raw.select(explode(col("articles")).as("a")).select(col("a.*"))
      val parsed = art.select(
        to_timestamp(col("published_at")).as("published_at"),
        col("id").cast("string").as("id"),
        col("title").cast("string").as("title"),
        col("url").cast("string").as("url"),
        col("author").cast("string").as("author"),
        col("description").cast("string").as("description"))
        .withColumn("source", lit(sourceName))
      // RSS seen-set semantics, batch flavor (§2.7). The reference keeps
      // the first-seen article per id (arrival order); batch has no
      // arrival order, so keep the earliest (published_at, url) instead —
      // dropDuplicates alone keeps a partition-arrival-dependent row.
      val byId = org.apache.spark.sql.expressions.Window
        .partitionBy("id").orderBy(col("published_at"), col("url"))
      conformWithDt(parsed, Schemas.NEWS, "published_at")
        .withColumn("_rn", row_number().over(byId))
        .filter(col("_rn") === 1).drop("_rn")
    }
  }
}
