package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

import graft.time.TimeNorm
import graft.types.Schemas

/** Hive-partitioned Parquet lake writer — the engine's
  * `write_to_parquet` (`adi/app/ingestion_service/utils.py:92-189`).
  *
  * The reference hand-rolls what Spark's committer gives us: dt
  * derivation, schema validation/coercion, sort-by-ts, atomic
  * tmp-write + rename, `k=v` partition-name sanitization. Here each maps
  * to a declarative step; atomicity comes free from the
  * FileCommitProtocol job commit (SURVEY §4).
  *
  * Deviation kept behind a flag: the reference rejects batches spanning
  * more than one `dt` (`utils.py:110-114`); Spark's `partitionBy("dt")`
  * splits multi-day batches natively. `strictSingleDt = true` restores
  * the reference's behavior for parity testing.
  */
object LakeWriter {

  /** Write a domain-conformed frame into `basePath` partitioned by
    * `partitions` (default: the reference's exchange/symbol/dt layout for
    * market data). Returns the base path. */
  def write(df: DataFrame, basePath: String, schema: StructType,
            tsCol: String, partitions: Seq[String] = Seq("dt"),
            mode: String = "append", strictSingleDt: Boolean = false): String = {
    val withDt =
      if (df.columns.contains("dt")) df
      else df.withColumn("dt", TimeNorm.dt(col(tsCol)))
    val conformed = Schemas.conformTo(withDt, schema, keepExtra = false)
    if (strictSingleDt) {
      val n = conformed.select(countDistinct(col("dt"))).head().getLong(0)
      require(n <= 1, s"strict single-dt write got $n distinct dt values (utils.py:110-114 parity)")
    }
    val sanitized = partitions.foldLeft(conformed) { (d, p) =>
      if (d.schema(p).dataType == org.apache.spark.sql.types.StringType)
        d.withColumn(p, TimeNorm.sanitizePartitionValue(col(p)))
      else d
    }
    // deterministic files: rows sorted by ts within each output file
    sanitized
      .sortWithinPartitions((partitions :+ tsCol).map(col): _*)
      .write.mode(mode).partitionBy(partitions: _*).parquet(basePath)
    basePath
  }

  /** Legacy one-row raw persist (S20, `adi/app/storage.py:9-18`):
    * flatten a raw JSON payload and append it under source/symbol/date
    * partitions. */
  def persistRaw(spark: org.apache.spark.sql.SparkSession, basePath: String,
                 source: String, symbol: String, rawJson: String,
                 dateStr: String): String = {
    import spark.implicits._
    val df = spark.read.json(Seq(rawJson).toDS())
      .withColumn("source", lit(source))
      .withColumn("symbol", TimeNorm.sanitizePartitionValue(lit(symbol)))
      .withColumn("date", lit(dateStr))
    df.write.mode("append").partitionBy("source", "symbol", "date").parquet(basePath)
    basePath
  }

  /** Pruned read back: partition filters reach the directory listing, ts
    * filters reach parquet row-group stats (`load_ohlcv`,
    * `adi/scripts/build_market_dataset.py:41-73`). */
  def read(spark: org.apache.spark.sql.SparkSession, basePath: String,
           partitionFilters: Map[String, String] = Map.empty): DataFrame =
    partitionFilters.foldLeft(spark.read.parquet(basePath)) {
      case (d, (k, v)) => d.filter(col(k) === v)
    }
}
