package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session (one per suite, per §5 porting notes). */
trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  def approx(a: Double, b: Double, tol: Double = 1e-9): Boolean = math.abs(a - b) <= tol

  /** OHLCV ramp fixture — FIXTURES.md F1 (`test_market_factory.py:12-33`):
    * close = 100, 101, …; high/low = close ± 0.5; open = prev close. */
  def ohlcvRamp(n: Int, symbol: String = "BTC/USDT"): org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    val base = java.time.Instant.parse("2025-08-01T00:00:00Z").getEpochSecond
    (0 until n).map { i =>
      val close = 100.0 + i
      val open = if (i == 0) close else 100.0 + i - 1
      (java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(base + i * 60L)),
        open, close + 0.5, close - 0.5, close, 10.0 + i * 0.1,
        symbol, "binance", "1m")
    }.toDF("timestamp", "open", "high", "low", "close", "volume",
      "symbol", "exchange", "timeframe")
  }

  /** HLC ramp fixture — FIXTURES.md F2: close = 1..n, high = close+1,
    * low = close-1, volume = 1. */
  def hlcRamp(n: Int): org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    val base = java.time.Instant.parse("2025-01-01T00:00:00Z").getEpochSecond
    (1 to n).map { i =>
      (java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(base + i * 86400L)),
        i.toDouble + 1, i.toDouble - 1, i.toDouble, 1.0, "S", "x", "1d")
    }.toDF("timestamp", "high", "low", "close", "volume", "symbol", "exchange", "timeframe")
  }
}
