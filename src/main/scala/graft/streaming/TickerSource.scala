package graft.streaming

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DSv2 micro-batch streaming source standing in for the reference's
  * WebSocket ticker loops (`adi/app/adapters/ccxt_adapter.py:151-163`,
  * `Main.py:16-21` `watch_ticker` forever-loop) — S4.
  *
  * A real deployment would terminate the socket at an ingestion edge and
  * read the landed records; this source closes the remaining gap for ST1
  * by exercising the actual DSv2 `MicroBatchStream` machinery (offsets,
  * planInputPartitions, per-partition readers, commit) instead of a
  * file-drop directory. Bars are synthesized deterministically from
  * (symbol, bar index) hashes, so tests assert exact values and restarts
  * replay identically from the checkpointed offset.
  *
  * Offsets are global bar indexes; each `latestOffset()` poll advances the
  * watermark by `barsPerBatch` up to `maxBars` (virtual time — no
  * wall-clock flake in tests; a production ticker would derive the latest
  * bar from the clock instead). One input partition per symbol per batch:
  * parallelism scales with the symbol universe, the way the reference
  * fans out one socket per market.
  *
  * Usage:
  * {{{
  * spark.readStream.format(classOf[TickerSourceProvider].getName)
  *   .option("symbols", "BTC-USDT,ETH-USDT")
  *   .option("startEpochSec", "1704067200").option("stepSec", "60")
  *   .option("barsPerBatch", "30").option("maxBars", "300").load()
  * }}}
  */
object TickerSource {

  /** MARKET minus the derived `dt` (added by the lake writer downstream). */
  val Schema: StructType = StructType(Seq(
    StructField("timestamp", TimestampType),
    StructField("symbol", StringType),
    StructField("exchange", StringType),
    StructField("timeframe", StringType),
    StructField("open", DoubleType),
    StructField("high", DoubleType),
    StructField("low", DoubleType),
    StructField("close", DoubleType),
    StructField("volume", DoubleType)
  ))

  private def h(symbol: String, j: Long): Int = {
    val x = scala.util.hashing.MurmurHash3.stringHash(s"$symbol:$j")
    ((x % 1000) + 1000) % 1000
  }

  /** Deterministic OHLCV for (symbol, bar index): a hash walk where each
    * bar opens at the previous close. */
  def bar(symbol: String, i: Long): (Double, Double, Double, Double, Double) = {
    val close = 100.0 + h(symbol, i) / 100.0
    val open = 100.0 + h(symbol, i - 1) / 100.0
    val hi = math.max(open, close) + 0.5
    val lo = math.min(open, close) - 0.5
    val vol = 10.0 + (h(symbol, i) % 70) / 10.0
    (open, hi, lo, close, vol)
  }

  case class TickerOffset(barIdx: Long) extends Offset {
    override def json: String = s"""{"bar":$barIdx}"""
  }

  object TickerOffset {
    def fromJson(json: String): TickerOffset =
      TickerOffset("\"bar\"\\s*:\\s*(\\d+)".r.findFirstMatchIn(json)
        .map(_.group(1).toLong)
        .getOrElse(throw new IllegalArgumentException(s"bad ticker offset: $json")))
  }

  case class TickerPartition(symbol: String, exchange: String, timeframe: String,
                             startEpochSec: Long, stepSec: Long,
                             fromBar: Long, untilBar: Long) extends InputPartition
}

class TickerSourceProvider extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    TickerSource.Schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new TickerTable(new CaseInsensitiveStringMap(properties))
}

class TickerTable(options: CaseInsensitiveStringMap) extends Table with SupportsRead {
  override def name(): String = "graft_ticker"
  override def schema(): StructType = TickerSource.Schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(caseInsensitiveOptions: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new Scan {
        override def readSchema(): StructType = TickerSource.Schema
        override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
          new TickerMicroBatchStream(options)
      }
    }
}

class TickerMicroBatchStream(options: CaseInsensitiveStringMap) extends MicroBatchStream {
  import TickerSource._

  private val symbols = options.getOrDefault("symbols", "BTC-USDT")
    .split(",").map(_.trim).filter(_.nonEmpty).toSeq
  private val exchange = options.getOrDefault("exchange", "binance")
  private val timeframe = options.getOrDefault("timeframe", "1m")
  private val startEpochSec = options.getOrDefault("startEpochSec", "1704067200").toLong
  private val stepSec = options.getOrDefault("stepSec", "60").toLong
  private val barsPerBatch = options.getOrDefault("barsPerBatch", "60").toLong
  private val maxBars = options.getOrDefault("maxBars", Long.MaxValue.toString).toLong

  // virtual-time watermark: advances per poll, capped at maxBars
  private val highWater = new java.util.concurrent.atomic.AtomicLong(0L)

  /** A fresh stream instance starts at 0; on restart Spark hands back the
    * checkpointed offsets via deserializeOffset/commit, and the watermark
    * must never regress below them or committed bar ranges would replay. */
  private def advanceTo(barIdx: Long): Unit =
    highWater.updateAndGet(w => math.max(w, math.min(barIdx, maxBars)))

  override def initialOffset(): Offset = TickerOffset(0L)

  override def latestOffset(): Offset =
    TickerOffset(highWater.updateAndGet(w => math.min(w + barsPerBatch, maxBars)))

  override def deserializeOffset(json: String): Offset = {
    val o = TickerOffset.fromJson(json)
    advanceTo(o.barIdx)
    o
  }

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val from = start.asInstanceOf[TickerOffset].barIdx
    val until = end.asInstanceOf[TickerOffset].barIdx
    symbols.map(s =>
      TickerPartition(s, exchange, timeframe, startEpochSec, stepSec, from, until)
        .asInstanceOf[InputPartition]).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new PartitionReaderFactory {
      override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
        val p = partition.asInstanceOf[TickerPartition]
        new PartitionReader[InternalRow] {
          private var i = p.fromBar - 1
          override def next(): Boolean = { i += 1; i < p.untilBar }
          override def get(): InternalRow = {
            val (open, hi, lo, close, vol) = bar(p.symbol, i)
            new GenericInternalRow(Array[Any](
              (p.startEpochSec + i * p.stepSec) * 1000000L, // epoch micros
              UTF8String.fromString(p.symbol),
              UTF8String.fromString(p.exchange),
              UTF8String.fromString(p.timeframe),
              open, hi, lo, close, vol))
          }
          override def close(): Unit = ()
        }
      }
    }

  override def commit(end: Offset): Unit =
    advanceTo(end.asInstanceOf[TickerOffset].barIdx)
  override def stop(): Unit = ()
}
