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

  // ------------------------------------------------------------------
  // Legacy `year=/month=/day=` layout — the reference's ingest route
  // writes exchange/symbol/year/month/day partitions
  // (`adi/app/ingestion_service/routes.py:245-251`) while newer jobs use
  // `dt=`; a migrated lake carries both, so both need read/write paths.
  // ------------------------------------------------------------------

  /** Write in the legacy layout: `extraPartitions ++ year/month/day`
    * derived from `tsCol`, same conform/sanitize/sort contract as
    * [[write]]. */
  def writeLegacy(df: DataFrame, basePath: String, schema: StructType,
                  tsCol: String, extraPartitions: Seq[String] = Seq("exchange", "symbol"),
                  mode: String = "append"): String = {
    val conformed = Schemas.conformTo(df, schema, keepExtra = false).drop("dt")
      .withColumn("year", year(col(tsCol)))
      .withColumn("month", month(col(tsCol)))
      .withColumn("day", dayofmonth(col(tsCol)))
    val parts = extraPartitions ++ Seq("year", "month", "day")
    val sanitized = extraPartitions.foldLeft(conformed) { (d, p) =>
      if (d.schema(p).dataType == org.apache.spark.sql.types.StringType)
        d.withColumn(p, TimeNorm.sanitizePartitionValue(col(p)))
      else d
    }
    sanitized
      .sortWithinPartitions((parts :+ tsCol).map(col): _*)
      .write.mode(mode).partitionBy(parts: _*).parquet(basePath)
    basePath
  }

  /** Read a legacy-layout table, reconstructing the `dt` column the
    * modern layout carries. Apply [[legacyDtRange]] BEFORE this column is
    * used for range filters — predicates on the reconstructed `dt` can't
    * prune directories, predicates on year/month/day can. */
  def readLegacy(spark: org.apache.spark.sql.SparkSession, basePath: String,
                 partitionFilters: Map[String, String] = Map.empty): DataFrame =
    read(spark, basePath, partitionFilters)
      .withColumn("dt",
        date_format(make_date(col("year"), col("month"), col("day")), "yyyy-MM-dd"))
      .drop("year", "month", "day")

  /** dt-range predicate over the legacy partition columns — references
    * year/month/day only, so the directory listing itself is pruned
    * (the pruning role of `_date_in_range_from_dt_folder`,
    * `adi/app/features/backfill/core.py:35-38`). */
  def legacyDtRange(startDt: String, endDt: String): org.apache.spark.sql.Column = {
    val s = java.time.LocalDate.parse(startDt)
    val e = java.time.LocalDate.parse(endDt)
    val lower = (col("year") > s.getYear) ||
      (col("year") === s.getYear && ((col("month") > s.getMonthValue) ||
        (col("month") === s.getMonthValue && col("day") >= s.getDayOfMonth)))
    val upper = (col("year") < e.getYear) ||
      (col("year") === e.getYear && ((col("month") < e.getMonthValue) ||
        (col("month") === e.getMonthValue && col("day") <= e.getDayOfMonth)))
    lower && upper
  }

  /** Compact small files — the maintenance pass a streamed-into lake
    * needs at scale (every micro-batch append leaves a file per task;
    * at 100 TB the listing + open cost of millions of tiny files
    * dominates scans long before data volume does). Rewrites the
    * (optionally filtered) partitions as range-clustered files of at
    * most `targetRowsPerFile` rows: `repartitionByRange` over
    * (partitions, ts) splits hot partitions across tasks while keeping
    * each output file a contiguous (partition, ts) slice, and slice
    * count is derived from the actual row count so a small table
    * collapses to one file per partition instead of inheriting
    * `spark.sql.shuffle.partitions` shards. Dynamic partition overwrite
    * (per-writer option, no session conf mutation) replaces only the
    * partitions present in the snapshot — with `partitionFilters`, the
    * rest of the lake is untouched. The snapshot is persisted before the
    * overwrite, same read-then-replace contract as `FeatureStore.upsert`.
    *
    * CONCURRENCY CONTRACT: the read-snapshot-then-overwrite is NOT atomic
    * against writers of the SAME partitions — rows appended to an
    * in-scope partition between the snapshot and the commit are lost with
    * the overwrite. Callers must scope compaction to CLOSED partitions
    * (no live writer), via `partitionFilters` or `partitionPredicate` —
    * see `Scheduler.compactOnce`, which compacts only dt partitions past
    * the ingest horizon. `partitionPredicate` exists for exactly that:
    * range predicates over partition columns (e.g. `dt < today`) that the
    * equality-only `partitionFilters` can't express; it references
    * partition columns, so pruning happens at the directory listing.
    * Returns the number of rows rewritten. */
  def compact(spark: org.apache.spark.sql.SparkSession, basePath: String,
              tsCol: String, partitions: Seq[String] = Seq("dt"),
              targetRowsPerFile: Long = 1L << 20,
              partitionFilters: Map[String, String] = Map.empty,
              partitionPredicate: Option[org.apache.spark.sql.Column] = None): Long = {
    require(targetRowsPerFile > 0, "targetRowsPerFile must be positive")
    val base = partitionPredicate.foldLeft(
      read(spark, basePath, partitionFilters))(_ filter _)
    val total = base.count()
    if (total == 0) return 0L
    val nSlices = math.max(1L, (total + targetRowsPerFile - 1) / targetRowsPerFile)
      .min(Int.MaxValue.toLong).toInt
    val cols = (partitions :+ tsCol).map(col)
    val snap = base
      .repartitionByRange(nSlices, cols: _*)
      .sortWithinPartitions(cols: _*)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    snap.count() // materialize before overwriting the files it reads from
    snap.write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .option("maxRecordsPerFile", targetRowsPerFile)
      .partitionBy(partitions: _*).parquet(basePath)
    snap.unpersist()
    total
  }

  /** Z-order clustered parquet write — multi-dimensional locality for
    * row-group/file pruning. Each z-column is min-max quantized to
    * `bits` buckets and the bucket bits are interleaved into one z-value;
    * range-partitioning + sorting by that value gives every output file
    * a TIGHT min/max envelope on EVERY z-column simultaneously, so a
    * selective filter on any of them prunes most files from the scan
    * (classic Morton layout; a single-column sort only prunes its own
    * column). At 100 TB this is the difference between "filters on
    * (symbol, ts) read ~√F of F files" and "filters on the second sort
    * column read everything".
    *
    * The min/max ranges are one scalar aggregate (driver metadata, like
    * the IVF centroid read). Min-max quantization is skew-sensitive: a
    * heavy-hitter value crowds its bucket and weakens pruning for its
    * neighbors — acceptable for time/id-like columns; quantile-quantize
    * upstream if a z-column is pathologically skewed. Numeric and
    * timestamp columns only. Returns rows written. */
  def zorderWrite(df: DataFrame, path: String, zCols: Seq[String],
                  bits: Int = 12, targetRowsPerFile: Long = 1L << 20): Long = {
    require(zCols.size >= 2, "z-ordering needs >= 2 columns (else just sort)")
    require(bits >= 1 && bits * zCols.size <= 62,
      s"bits*cols must fit a long, got $bits*${zCols.size}")
    val asNum = zCols.map(c => col(c).cast("double"))
    // ranges come from FINITE values only: one NaN would make max() NaN,
    // span NaN, and every bucket on that dimension silently 0 (ANSI off
    // casts NaN→0) — clustering quietly destroyed. Non-finite rows still
    // write; their bucket clamps to an edge. Row count rides the same
    // single aggregate (no second scan of a 100 TB input).
    def finite(c: org.apache.spark.sql.Column) =
      when(!isnan(c) && c =!= lit(Double.PositiveInfinity) &&
        c =!= lit(Double.NegativeInfinity), c)
    val rangeRow = df.select(
      asNum.zipWithIndex.flatMap { case (c, i) =>
        Seq(min(finite(c)).as(s"mn$i"), max(finite(c)).as(s"mx$i")) } :+
        count(lit(1)).as("_n"): _*).head()
    val total = rangeRow.getLong(2 * zCols.size)
    if (total == 0) return 0L
    val buckets = zCols.indices.map { i =>
      // an all-null z-column has no range: it contributes bucket 0
      if (rangeRow.isNullAt(2 * i)) lit(0L)
      else {
      val (mn, mx) = (rangeRow.getDouble(2 * i), rangeRow.getDouble(2 * i + 1))
      val span = mx - mn
      if (span <= 0) lit(0L)
      else least(lit((1L << bits) - 1), greatest(lit(0L),
        floor((asNum(i) - lit(mn)) / lit(span) * lit(1L << bits)).cast("long")))
      }
    }
    val zval = (0 until bits).flatMap { b =>
      buckets.zipWithIndex.map { case (bk, i) =>
        shiftleft(shiftright(bk, b).bitwiseAND(lit(1L)), b * zCols.size + i)
      }
    }.reduce(_ bitwiseOR _)
    val nSlices = math.max(1L, (total + targetRowsPerFile - 1) / targetRowsPerFile)
      .min(Int.MaxValue.toLong).toInt
    df.withColumn("_z", zval)
      .repartitionByRange(nSlices, col("_z"))
      .sortWithinPartitions("_z")
      .drop("_z")
      .write.mode("overwrite")
      .option("maxRecordsPerFile", targetRowsPerFile)
      .parquet(path)
    total
  }

  /** Write a frame as a BUCKETED managed table: rows are hash-partitioned
    * into `nBuckets` files per partition by `bucketCols` and sorted
    * within each bucket. Two tables bucketed the same way join with ZERO
    * exchanges — at 100 TB this turns every repeated fact⋈fact join on
    * the bucket key (e.g. features ⋈ labels on series key) from a
    * full-corpus shuffle into a local merge, paid once at write time.
    * Managed-table API because bucket metadata lives in the catalog;
    * plain parquet paths can't carry it. */
  def writeBucketed(df: DataFrame, table: String, bucketCols: Seq[String],
                    nBuckets: Int = 32, mode: String = "overwrite"): Unit =
    df.write.mode(mode)
      .bucketBy(nBuckets, bucketCols.head, bucketCols.tail: _*)
      .sortBy(bucketCols.head, bucketCols.tail: _*)
      .format("parquet")
      .saveAsTable(table)
}
