package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Incremental market analytics — fold a new micro-batch of ticks into
  * standing volume-bar and triple-barrier state WITHOUT recomputing
  * history: the [[Relational.mergeSessions]] sufficient-statistics
  * pattern applied to the AFML bar/label operators.
  *
  * Sufficient statistics per series:
  *  - BARS: the cumulative quantized volume (`cum_cents`) — bar
  *    membership under [[Resample.volumeBars]]' floor-division contract
  *    depends on nothing else — plus each stored bar's OHLCV aggregate
  *    (open/close ride their endpoint timestamps, so two partial
  *    aggregates of the same bar combine exactly);
  *  - LABELS: each entry's first barrier-touch times found SO FAR. New
  *    ticks can only add LATER touches (the ordering contract below),
  *    so a stored touch is final the moment it exists, and an entry
  *    stops being a candidate once both barriers are resolved or the
  *    series watermark passes its horizon. Ticks themselves are never
  *    stored — each batch's ticks are compared against open entries
  *    exactly once.
  *
  * ORDERING CONTRACT (the standard warehouse-load contract, as
  * [[Relational.scd2Merge]]): batches arrive per-series time-ordered —
  * every new tick strictly after the series' stored `(ts, tiebreak)`
  * watermark. Violations raise rather than silently corrupt bar
  * boundaries. Replays of a committed batch id are no-ops in
  * [[marketTickBatch]].
  *
  * Equivalence gate (spec-pinned): after any batch sequence, `bars` ≡
  * [[Resample.volumeBars]] over the full history and [[labels]] ≡
  * [[Labeling.tripleBarrier]] over the full history, column for column.
  *
  * Scale shape: every stage is keyed on the series — the in-batch
  * prefix window, the bar merge groupBy, the entry-vs-tick horizon
  * join (the tripleBarrier SMJ shape, batch-sized right side) and the
  * watermark join. Stored state never rescans history: bars touch only
  * (series, bar_id) rows present in the batch or the store, entries
  * only the still-open ones. */
object MarketIncremental {

  /** All knobs of the fold, shared by every function here so the batch
    * and incremental paths cannot drift. `tiebreakCol` must make
    * (tsCol, tiebreakCol) a total order per series. */
  final case class Cfg(keys: Seq[String], tsCol: String, priceCol: String,
                       volCol: String, tiebreakCol: String,
                       volThreshold: Double, horizonUs: Long,
                       upPct: Double, dnPct: Double) {
    require(keys.nonEmpty, "incremental market state needs series keys")
    require(volThreshold > 0.0, s"volThreshold must be positive, got $volThreshold")
    require(horizonUs > 0L, s"horizon must be positive, got $horizonUs")
    require(upPct > 0.0 && dnPct > 0.0 && dnPct < 1.0,
      s"need upPct > 0 and 0 < dnPct < 1, got $upPct/$dnPct")
    val thrFp: Long = math.round(volThreshold * 100)
    require(thrFp > 0L, s"volThreshold quantizes to 0 cents: $volThreshold")
  }

  /** Empty state frames with the exact schemas the merges produce. */
  def emptyBars(spark: SparkSession, cfg: Cfg): DataFrame =
    spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      org.apache.spark.sql.types.StructType(
        cfg.keys.map(k => org.apache.spark.sql.types.StructField(k,
          org.apache.spark.sql.types.StringType)) ++ Seq(
          field("bar_id", "long"), field("open", "double"),
          field("high", "double"), field("low", "double"),
          field("close", "double"), field("volume", "double"),
          field("n_ticks", "long"), field("open_ts_us", "long"),
          field("close_ts_us", "long"))))

  def emptyCarry(spark: SparkSession, cfg: Cfg): DataFrame =
    spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      org.apache.spark.sql.types.StructType(
        cfg.keys.map(k => org.apache.spark.sql.types.StructField(k,
          org.apache.spark.sql.types.StringType)) ++ Seq(
          field("cum_cents", "long"), field("w_ts_us", "long"),
          field("w_tb", "long"))))

  def emptyEntries(spark: SparkSession, cfg: Cfg): DataFrame =
    spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      org.apache.spark.sql.types.StructType(
        cfg.keys.map(k => org.apache.spark.sql.types.StructField(k,
          org.apache.spark.sql.types.StringType)) ++ Seq(
          field("ts_us", "long"), field("price", "double"),
          field("_eid", "long"), field("t_up_us", "long"),
          field("t_dn_us", "long"), field("is_final", "boolean"))))

  private def field(n: String, t: String) =
    org.apache.spark.sql.types.StructField(n,
      org.apache.spark.sql.types.DataType.fromDDL(t))

  /** Normalized batch ticks: `(keys…, ts_us, _tb, price, _cents)`, with
    * the per-series ordering guard against the stored watermark baked
    * into `_cents` (a violating tick fails the job loudly — silently
    * accepting it would corrupt every later bar boundary). */
  private def guardedTicks(batch: DataFrame, carry: DataFrame, cfg: Cfg): DataFrame = {
    val tsUs = unix_micros(col(cfg.tsCol).cast("timestamp"))
    val raw = batch.select(
      cfg.keys.map(c => col(c).cast("string").as(c)) ++ Seq(
        tsUs.as("ts_us"),
        col(cfg.tiebreakCol).cast("long").as("_tb"),
        col(cfg.priceCol).cast("double").as("price"),
        col(cfg.volCol).cast("double").as("_vol"),
        floor(col(cfg.volCol).cast("double") * 100).cast("long").as("_rawc")): _*)
    raw.join(carry.select(cfg.keys.map(col) :+ col("w_ts_us") :+ col("w_tb"): _*),
        cfg.keys, "left")
      .withColumn("_cents",
        when(col("w_ts_us").isNotNull &&
            (col("ts_us") < col("w_ts_us") ||
              (col("ts_us") === col("w_ts_us") && col("_tb") <= col("w_tb"))),
          raise_error(concat(lit("marketTick ordering contract violated: tick at "),
            col("ts_us").cast("string"), lit("us is not after the stored watermark "),
            col("w_ts_us").cast("string"), lit("us — batches must be per-series time-ordered"))))
        .otherwise(col("_rawc")))
      .drop("w_ts_us", "w_tb", "_rawc")
  }

  /** Fold a tick batch into the bar state. Returns (bars', carry'). */
  def volumeBarsMerge(storedBars: DataFrame, storedCarry: DataFrame,
                      batch: DataFrame, cfg: Cfg): (DataFrame, DataFrame) = {
    val K = cfg.keys
    val ticks = guardedTicks(batch, storedCarry, cfg)
    val w = Window.partitionBy(K.map(col): _*).orderBy(col("ts_us"), col("_tb"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val withCum = ticks
      .join(storedCarry.select(K.map(col) :+ col("cum_cents").as("_base"): _*),
        K, "left")
      .withColumn("_cumb",
        coalesce(sum(col("_cents")).over(w), lit(0L)) + coalesce(col("_base"), lit(0L)))
      .withColumn("bar_id",
        expr(s"(_cumb - pmod(_cumb, ${cfg.thrFp}L)) div ${cfg.thrFp}L"))
    val ord = struct(col("ts_us"), col("_tb"))
    val partials = withCum.groupBy((K :+ "bar_id").map(col): _*)
      .agg(min_by(col("price"), ord).as("open"),
        max(col("price")).as("high"), min(col("price")).as("low"),
        max_by(col("price"), ord).as("close"),
        sum(col("_vol").cast(org.apache.spark.sql.types.DecimalType(18, 2)))
          .cast("double").as("volume"),
        count(lit(1)).as("n_ticks"),
        min(col("ts_us")).as("open_ts_us"),
        max(col("ts_us")).as("close_ts_us"))
    // combine partial aggregates of the same bar: open/close elect by
    // their endpoint timestamps (exact under the ordering contract —
    // a stored bar always precedes its batch extension), volume re-sums
    // through DECIMAL so the double stays the exact 2-dp value
    val bars2 = storedBars.unionByName(partials)
      .groupBy((K :+ "bar_id").map(col): _*)
      .agg(min_by(col("open"), col("open_ts_us")).as("open"),
        max(col("high")).as("high"), min(col("low")).as("low"),
        max_by(col("close"), col("close_ts_us")).as("close"),
        sum(col("volume").cast(org.apache.spark.sql.types.DecimalType(18, 2)))
          .cast("double").as("volume"),
        sum(col("n_ticks")).as("n_ticks"),
        min(col("open_ts_us")).as("open_ts_us"),
        max(col("close_ts_us")).as("close_ts_us"))
    val bAgg = withCum.groupBy(K.map(col): _*)
      .agg(sum(col("_cents")).as("_add"),
        max(struct(col("ts_us"), col("_tb"))).as("_w"))
    val carry2 = storedCarry.join(bAgg, K, "full")
      .select(K.map(col) ++ Seq(
        (coalesce(col("cum_cents"), lit(0L)) + coalesce(col("_add"), lit(0L)))
          .as("cum_cents"),
        coalesce(col("_w").getField("ts_us"), col("w_ts_us")).as("w_ts_us"),
        coalesce(col("_w").getField("_tb"), col("w_tb")).as("w_tb")): _*)
    (bars2, carry2)
  }

  /** Fold a tick batch into the entry/label state. `carryAfter` is the
    * POST-merge carry (its watermark decides horizon expiry). Every
    * batch tick becomes a new entry; open entries of the batch's series
    * scan the batch's ticks for barrier touches (first touch wins —
    * stored touches are by construction earlier than anything new). */
  def tripleBarrierMerge(storedEntries: DataFrame, batch: DataFrame,
                         carryAfter: DataFrame, cfg: Cfg): DataFrame = {
    val K = cfg.keys
    val ticks = batch.select(
      K.map(c => col(c).cast("string").as(c)) ++ Seq(
        unix_micros(col(cfg.tsCol).cast("timestamp")).as("ts_us"),
        col(cfg.priceCol).cast("double").as("price"),
        col(cfg.tiebreakCol).cast("long").as("_eid")): _*)
    val newEntries = ticks
      .withColumn("t_up_us", lit(null).cast("long"))
      .withColumn("t_dn_us", lit(null).cast("long"))
      .withColumn("is_final", lit(false))
    val batchKeys = ticks.select(K.map(col): _*).distinct()
    val openStored = storedEntries.where(!col("is_final"))
    val cand = openStored.join(batchKeys, K, "left_semi").unionByName(newEntries)
    val eSide = cand.select(
      K.map(k => col(k).as(s"_e_$k")) ++ Seq(col("ts_us").as("_e_ts"),
        col("price").as("_e_p"), col("_eid").as("_e_id"),
        col("t_up_us"), col("t_dn_us")): _*)
    val joinCond = K.map(k => col(s"_e_$k") === col(k)).reduce(_ && _) &&
      col("ts_us") > col("_e_ts") &&
      col("ts_us") <= col("_e_ts") + lit(cfg.horizonUs)
    val up = col("price") >= col("_e_p") * lit(1.0 + cfg.upPct)
    val dn = col("price") <= col("_e_p") * lit(1.0 - cfg.dnPct)
    val hits = eSide.join(ticks, joinCond)
      .groupBy((K.map(k => col(s"_e_$k")) :+ col("_e_ts") :+ col("_e_id")): _*)
      .agg(min(when(up, col("ts_us"))).as("_nu"),
        min(when(dn, col("ts_us"))).as("_nd"))
    val touched = eSide.join(hits,
        K.map(k => s"_e_$k") :+ "_e_ts" :+ "_e_id", "left")
      .select(K.map(k => col(s"_e_$k").as(k)) ++ Seq(
        col("_e_ts").as("ts_us"), col("_e_p").as("price"),
        col("_e_id").as("_eid"),
        coalesce(col("t_up_us"), col("_nu")).as("t_up_us"),
        coalesce(col("t_dn_us"), col("_nd")).as("t_dn_us")): _*)
    val merged = touched
      .join(carryAfter.select(K.map(col) :+ col("w_ts_us"): _*), K, "left")
      .withColumn("is_final",
        (col("t_up_us").isNotNull && col("t_dn_us").isNotNull) ||
          coalesce(col("w_ts_us"), lit(Long.MinValue)) > col("ts_us") + cfg.horizonUs)
      .drop("w_ts_us")
    storedEntries.where(col("is_final"))
      .unionByName(openStored.join(batchKeys, K, "left_anti"))
      .unionByName(merged)
  }

  /** The [[Labeling.tripleBarrier]]-equivalent view of the entry state —
    * identical columns, identical label rule (open entries read as
    * time-barrier 0, exactly like the batch operator at end-of-data). */
  def labels(entries: DataFrame, cfg: Cfg): DataFrame =
    entries.select(
      cfg.keys.map(col) ++ Seq(col("ts_us"), col("price"),
        col("t_up_us"), col("t_dn_us"),
        when(col("t_up_us").isNotNull &&
            (col("t_dn_us").isNull || col("t_up_us") <= col("t_dn_us")), lit(1L))
          .when(col("t_dn_us").isNotNull, lit(-1L))
          .otherwise(lit(0L)).as("label")): _*)

  // ------------------------------------------------------------------
  // Persistent foreachBatch wiring: versioned state + commit markers
  // (the incremental-dedup `_commits` idempotency pattern — a replayed
  // batch id is a no-op, a torn write without its marker is invisible).
  // ------------------------------------------------------------------

  private def fs(spark: SparkSession, path: String) =
    new org.apache.hadoop.fs.Path(path).getFileSystem(
      spark.sparkContext.hadoopConfiguration)

  /** Committed batch ids at `stateDir`, numerically ordered. */
  def committedVersions(spark: SparkSession, stateDir: String): Seq[Long] = {
    val d = new org.apache.hadoop.fs.Path(s"$stateDir/_commits")
    val f = fs(spark, stateDir)
    if (!f.exists(d)) Seq.empty
    else f.listStatus(d).toSeq.map(_.getPath.getName.toLong).sorted
  }

  private def readState(spark: SparkSession, stateDir: String, cfg: Cfg)
      : (DataFrame, DataFrame, DataFrame) =
    committedVersions(spark, stateDir).lastOption match {
      case None =>
        (emptyBars(spark, cfg), emptyCarry(spark, cfg), emptyEntries(spark, cfg))
      case Some(v) =>
        (spark.read.parquet(s"$stateDir/v=$v/bars"),
          spark.read.parquet(s"$stateDir/v=$v/carry"),
          spark.read.parquet(s"$stateDir/v=$v/entries"))
    }

  /** The foreachBatch body: fold `batch` into the state at `stateDir`
    * under batch id `batchId` (replay-idempotent), returning the
    * post-fold label view. Superseded state versions older than the
    * previous one are dropped (two survivors: crash-safe rollback). */
  def marketTickBatch(spark: SparkSession, stateDir: String, batchId: Long,
                      batch: DataFrame, cfg: Cfg): DataFrame = {
    val done = committedVersions(spark, stateDir)
    if (done.contains(batchId)) {
      val (_, _, entries) = readState(spark, stateDir, cfg)
      return labels(entries, cfg)
    }
    val (bars0, carry0, entries0) = readState(spark, stateDir, cfg)
    val (bars1, carry1) = volumeBarsMerge(bars0, carry0, batch, cfg)
    val carry1s = carry1.localCheckpoint(true)
    val entries1 = tripleBarrierMerge(entries0, batch, carry1s, cfg)
    val v = s"$stateDir/v=$batchId"
    bars1.write.mode("overwrite").parquet(s"$v/bars")
    carry1s.write.mode("overwrite").parquet(s"$v/carry")
    entries1.write.mode("overwrite").parquet(s"$v/entries")
    val f = fs(spark, stateDir)
    f.mkdirs(new org.apache.hadoop.fs.Path(s"$stateDir/_commits"))
    f.create(new org.apache.hadoop.fs.Path(s"$stateDir/_commits/$batchId"),
      true).close()
    // GC: keep the committed predecessor for rollback, drop older ones
    done.dropRight(1).foreach { old =>
      f.delete(new org.apache.hadoop.fs.Path(s"$stateDir/v=$old"), true)
      f.delete(new org.apache.hadoop.fs.Path(s"$stateDir/_commits/$old"), false)
    }
    labels(spark.read.parquet(s"$v/entries"), cfg)
  }
}
