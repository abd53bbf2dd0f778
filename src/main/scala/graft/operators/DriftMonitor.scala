package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Streaming feature-drift monitor — the [[Relational.psiDrift]] PSI
  * scorecard turned into an ingest-time loop (the reference's scheduled
  * monitoring jobs poll batch tables; a 100 TB pipeline wants the drift
  * score maintained INCREMENTALLY as micro-batches land, without
  * rescanning history).
  *
  * Index layout at `path` (the [[Dedup.writeMinhashIndex]] atomic-commit
  * protocol, single writer assumed):
  *   - `bounds/`  — per-key reference `(keys…, _mn, _mx)` bin anchors
  *   - `ref/`     — per-key reference bin counts `(keys…, bin, c_ref)`
  *   - `cur/batch=<id>/` — one micro-batch's bin counts `(keys…, bin, c_cur)`
  *   - `_commits/<id>`   — atomic visibility markers (`ref` = the
  *     reference itself; anything else = a committed micro-batch)
  *
  * EQUIVALENCE CONTRACT (SystemSpec-pinned): after streaming batches
  * B₁..Bₙ, [[driftPsi]] ≡ `Relational.psiDrift(ref ∪ B₁ ∪ … ∪ Bₙ)`
  * column for column — both paths share [[Relational.equiWidthBucket]]
  * and [[Relational.psiFromCells]], so bucketing and smoothing cannot
  * silently diverge.
  *
  * Scale shape: the persisted state is keys×bins count rows per batch —
  * BOUNDED regardless of batch size; each micro-batch pays one grouped
  * count (map-side combined) + a broadcast of the key-sized bounds;
  * [[driftPsi]] reads only the skinny count tables, never raw history. */
object DriftMonitor {

  private val IdPattern = "[A-Za-z0-9_-]+"

  private def indexFs(spark: SparkSession, path: String) =
    new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Batch ids whose writes are committed (marker present). */
  def committedBatches(spark: SparkSession, path: String): Seq[String] = {
    val fs = indexFs(spark, path)
    val d = new org.apache.hadoop.fs.Path(s"$path/_commits")
    if (!fs.exists(d)) Seq.empty
    else fs.listStatus(d).filter(_.isFile).map(_.getPath.getName).toSeq
  }

  private def commit(spark: SparkSession, path: String, id: String): Unit = {
    val fs = indexFs(spark, path)
    fs.mkdirs(new org.apache.hadoop.fs.Path(s"$path/_commits"))
    // one atomic create = the commit point
    fs.create(new org.apache.hadoop.fs.Path(s"$path/_commits/$id"),
      false).close()
  }

  /** Anchor the monitor: per-key bin bounds + reference bin counts from
    * the fit-time slice (the scorecard convention — drift is measured
    * against where the model was fit). OVERWRITES `path`. Fails loudly
    * on a degenerate reference (min == max — [[Relational.psiDrift]]'s
    * guard: such a key would report ~0 drift on any shift). The
    * reference becomes visible only with the `_commits/ref` marker, so
    * a crash between the two table writes exposes nothing. */
  def writeDriftReference(df: DataFrame, keys: Seq[String],
                          valueCol: String, path: String,
                          bins: Int = 10): Unit = {
    require(keys.nonEmpty, "writeDriftReference needs the feature key(s)")
    require(bins > 0, s"bins must be positive, got $bins")
    val spark = df.sparkSession
    val v = col(valueCol).cast("double")
    val bounds = df.where(v.isNotNull)
      .groupBy(keys.map(col): _*).agg(min(v).as("_mn"), max(v).as("_mx"))
    val degenerate = bounds.where(col("_mx") === col("_mn"))
      .select(keys.map(col): _*).limit(5).collect()
    require(degenerate.isEmpty,
      s"writeDriftReference: degenerate reference slice (min == max) for " +
        s"key(s) ${degenerate.mkString(", ")} — bins cannot resolve drift " +
        "there; widen the reference window or exclude these keys")
    indexFs(spark, path).delete(new org.apache.hadoop.fs.Path(path), true)
    bounds.write.parquet(s"$path/bounds")
    val anchored = spark.read.parquet(s"$path/bounds")
    val bucket = Relational.equiWidthBucket(v, col("_mn"), col("_mx"), bins)
    df.where(v.isNotNull)
      .join(broadcast(anchored), keys)
      .groupBy(keys.map(col) :+ bucket.as("bin"): _*)
      .agg(count(lit(1)).as("c_ref"))
      .write.parquet(s"$path/ref")
    commit(spark, path, "ref")
  }

  /** Count one micro-batch into the reference bins and commit the batch
    * atomically — the `writeStream.foreachBatch` body. Idempotent per
    * `batchId` (at-least-once delivery replays skip instead of
    * double-counting); keys absent from the reference drop (nothing to
    * measure against — surface them upstream, the [[Relational.psiDrift]]
    * contract). Returns true if written, false on a replay skip. */
  def driftBatch(batch: DataFrame, keys: Seq[String], valueCol: String,
                 path: String, batchId: String, bins: Int = 10): Boolean = {
    require(batchId.matches(IdPattern) && batchId != "ref",
      s"batchId must match $IdPattern and not be 'ref', got '$batchId'")
    val spark = batch.sparkSession
    val committed = committedBatches(spark, path)
    require(committed.contains("ref"),
      s"driftBatch: no committed reference at $path — " +
        "run writeDriftReference first")
    if (committed.contains(batchId)) return false // replay no-op
    val bounds = spark.read.parquet(s"$path/bounds")
    val v = col(valueCol).cast("double")
    val bucket = Relational.equiWidthBucket(v, col("_mn"), col("_mx"), bins)
    batch.where(v.isNotNull)
      .join(broadcast(bounds), keys)
      .groupBy(keys.map(col) :+ bucket.as("bin"): _*)
      .agg(count(lit(1)).as("c_cur"))
      // overwrite: a torn earlier attempt of THIS batch (no marker yet)
      // is invisible to readers and safe to rewrite
      .write.mode("overwrite").parquet(s"$path/cur/batch=$batchId")
    commit(spark, path, batchId)
    true
  }

  /** PSI per key of everything streamed so far against the reference —
    * `(keys…, n_ref, n_cur, psi)`, the [[Relational.psiDrift]] output
    * shape. Reads ONLY the committed skinny count tables (uncommitted
    * batch directories prune at the listing via the `batch` partition
    * column); an empty monitor (no batches yet) reports the pure
    * smoothing floor with `n_cur = 0`. */
  def driftPsi(spark: SparkSession, path: String, keys: Seq[String],
               bins: Int = 10): DataFrame = {
    require(bins > 0, s"bins must be positive, got $bins")
    val committed = committedBatches(spark, path)
    require(committed.contains("ref"),
      s"driftPsi: no committed reference at $path")
    val bounds = spark.read.parquet(s"$path/bounds")
    val ref = spark.read.parquet(s"$path/ref")
    val batchIds = committed.filterNot(_ == "ref")
    val grid = bounds.select(keys.map(col) :+
      explode(sequence(lit(0L), lit(bins - 1L))).as("bin"): _*)
    val withRef = grid.join(ref, keys :+ "bin", "left")
    val cells =
      if (batchIds.isEmpty)
        withRef.select(keys.map(col) :+ col("bin") :+
          coalesce(col("c_ref"), lit(0L)).as("c_ref") :+
          lit(0L).as("c_cur"): _*)
      else {
        val cur = spark.read.parquet(s"$path/cur")
          .filter(col("batch").cast("string").isin(batchIds: _*))
          .groupBy(keys.map(col) :+ col("bin"): _*)
          .agg(sum(col("c_cur")).as("c_cur"))
        withRef.join(cur, keys :+ "bin", "left")
          .select(keys.map(col) :+ col("bin") :+
            coalesce(col("c_ref"), lit(0L)).as("c_ref") :+
            coalesce(col("c_cur"), lit(0L)).as("c_cur"): _*)
      }
    Relational.psiFromCells(cells, keys, bins)
  }

  // ------------------------------------------------------------------
  // Incremental CUSUM — [[Relational.cusumDetect]] folded over
  // micro-batches with a per-key carry frame (the [[MarketIncremental]]
  // fold pattern): the reflected statistic `S_t = P_t − min(0, min_{j≤t}
  // P_j)` needs only the LAST prefix value and the running minimum per
  // side, so the carry is two longs per side per key — bounded state
  // regardless of history length.
  // ------------------------------------------------------------------

  /** Empty CUSUM carry: `(keys…, p_pos, min_pos, p_neg, min_neg,
    * w_ts_us, w_tb)`. `min_*` hold `min(0, min over history of P)` —
    * always ≤ 0, so the bootstrap value is 0. */
  def emptyCusumCarry(spark: SparkSession, keys: Seq[String]): DataFrame =
    spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      org.apache.spark.sql.types.StructType(
        keys.map(k => org.apache.spark.sql.types.StructField(k,
          org.apache.spark.sql.types.StringType)) ++
          Seq("p_pos", "min_pos", "p_neg", "min_neg", "w_ts_us", "w_tb")
            .map(n => org.apache.spark.sql.types.StructField(n,
              org.apache.spark.sql.types.LongType))))

  /** Fold one micro-batch into the CUSUM state. Returns
    * `(scored, carry2)`: `scored` is exactly the
    * [[Relational.cusumDetect]] row shape for the batch's ticks
    * (OpsSpec-pinned equivalence: folding batches B₁..Bₙ and unioning
    * the scores ≡ one-shot `cusumDetect(B₁ ∪ … ∪ Bₙ)` column for
    * column), `carry2` the advanced state.
    *
    * Ordering contract (the [[MarketIncremental]] guards): every tick
    * must be strictly after the carried `(w_ts_us, w_tb)` watermark and
    * `(ts, tiebreak)` must be unique within the batch — a violation
    * raises at materialization rather than silently mis-folding the
    * sequential statistic. Keys are cast to STRING in the carry (one
    * canonical type across folds). Null values drop, like the one-shot.
    *
    * Scale shape: one keyed window pass over the batch + one keyed agg
    * + a key-sized full-outer carry merge — per-fold cost is O(batch)
    * plus O(keys), never O(history). Both returned frames are eagerly
    * localCheckpointed ([[MarketIncremental.volumeBarsFold]]'s
    * materialize-once contract). */
  def cusumFold(carry: DataFrame, batch: DataFrame, keys: Seq[String],
                tsCol: String, valueCol: String, tiebreakCol: String,
                target: Double, slack: Double, threshold: Double,
                scale: Double = 1e6): (DataFrame, DataFrame) = {
    require(keys.nonEmpty, "cusumFold needs the series key(s)")
    require(slack >= 0.0 && threshold > 0.0 && scale > 0.0,
      s"bad cusum params: slack=$slack threshold=$threshold scale=$scale")
    val tq = math.floor(target * scale).toLong
    val kq = math.floor(slack * scale).toLong
    val hq = math.floor(threshold * scale).toLong
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("ts_us"), col("_tb"))
    val wCum = w.rowsBetween(Window.unboundedPreceding, 0)
    val raw = batch.where(col(valueCol).isNotNull).select(
      keys.map(k => col(k).cast("string").as(k)) ++ Seq(
        unix_micros(col(tsCol).cast("timestamp")).as("ts_us"),
        col(tiebreakCol).cast("long").as("_tb"),
        floor(col(valueCol).cast("double") * scale).cast("long").as("_xq")): _*)
    val guarded = raw
      .join(carry, keys, "left")
      .withColumn("_dup",
        lag(struct(col("ts_us"), col("_tb")), 1).over(w) ===
          struct(col("ts_us"), col("_tb")))
      .withColumn("_xg",
        when(col("w_ts_us").isNotNull &&
            (col("ts_us") < col("w_ts_us") ||
              (col("ts_us") === col("w_ts_us") && col("_tb") <= col("w_tb"))),
          raise_error(concat(lit("cusumFold ordering contract violated: "),
            lit("tick at "), col("ts_us").cast("string"),
            lit("us is not after the carried watermark"))))
        .when(coalesce(col("_dup"), lit(false)),
          raise_error(lit("cusumFold ordering contract violated: duplicate " +
            "(ts, tiebreak) pair within one batch")))
        .otherwise(col("_xq")))
      .withColumn("_ip", col("_xg") - lit(tq) - lit(kq))
      .withColumn("_in", lit(tq) - col("_xg") - lit(kq))
      .withColumn("_pp",
        coalesce(col("p_pos"), lit(0L)) + sum(col("_ip")).over(wCum))
      .withColumn("_pn",
        coalesce(col("p_neg"), lit(0L)) + sum(col("_in")).over(wCum))
      .withColumn("_mp",
        least(coalesce(col("min_pos"), lit(0L)), min(col("_pp")).over(wCum)))
      .withColumn("_mn2",
        least(coalesce(col("min_neg"), lit(0L)), min(col("_pn")).over(wCum)))
      .withColumn("_sp", col("_pp") - col("_mp"))
      .withColumn("_sn", col("_pn") - col("_mn2"))
      .localCheckpoint(true)
    val scored = guarded.select(keys.map(col) ++ Seq(
        timestamp_micros(col("ts_us")).as(tsCol), col("_tb").as(tiebreakCol),
        round(col("_xq").cast("double") / lit(scale), 6).as("value"),
        round(col("_sp").cast("double") / lit(scale), 6).as("s_pos"),
        round(col("_sn").cast("double") / lit(scale), 6).as("s_neg"),
        (col("_sp") > lit(hq)).as("alarm_pos"),
        (col("_sn") > lit(hq)).as("alarm_neg")): _*)
      .orderBy(keys.map(col) ++ Seq(col(tsCol), col(tiebreakCol)): _*)
    val adv = guarded.groupBy(keys.map(col): _*)
      .agg(max_by(col("_pp"), struct(col("ts_us"), col("_tb"))).as("_lp"),
        max_by(col("_pn"), struct(col("ts_us"), col("_tb"))).as("_ln"),
        min(col("_mp")).as("_minp"), min(col("_mn2")).as("_minn"),
        max(struct(col("ts_us"), col("_tb"))).as("_w"))
    val carry2 = carry.join(adv, keys, "full")
      .select(keys.map(col) ++ Seq(
        coalesce(col("_lp"), col("p_pos"), lit(0L)).as("p_pos"),
        coalesce(col("_minp"), col("min_pos"), lit(0L)).as("min_pos"),
        coalesce(col("_ln"), col("p_neg"), lit(0L)).as("p_neg"),
        coalesce(col("_minn"), col("min_neg"), lit(0L)).as("min_neg"),
        coalesce(col("_w").getField("ts_us"), col("w_ts_us")).as("w_ts_us"),
        coalesce(col("_w").getField("_tb"), col("w_tb")).as("w_tb")): _*)
      .localCheckpoint(true)
    (scored, carry2)
  }

  /** Committed CUSUM state versions (ascending batch ids) at
    * `stateDir` — the [[MarketIncremental.committedVersions]] protocol
    * on this module's own state layout. */
  def committedCusumVersions(spark: SparkSession, stateDir: String): Seq[Long] = {
    val fs = indexFs(spark, stateDir)
    val d = new org.apache.hadoop.fs.Path(s"$stateDir/_commits")
    if (!fs.exists(d)) Seq.empty
    else fs.listStatus(d).filter(_.isFile)
      .map(_.getPath.getName.toLong).sorted.toSeq
  }

  /** The `writeStream.foreachBatch` body for streaming CUSUM: fold the
    * micro-batch with [[cusumFold]] against the last committed carry,
    * append the batch's scores to the permanent `scores/batch=<id>` log,
    * version the carry under `v=<id>/carry`, commit atomically.
    * Idempotent per `batchId` (at-least-once replays return the standing
    * view without refolding — the statistic would double-count
    * otherwise); crash between writes exposes nothing (no marker). Old
    * carry versions GC down to the committed predecessor.
    *
    * Returns [[cusumScores]] — everything scored so far. */
  def cusumBatch(spark: SparkSession, stateDir: String, batchId: Long,
                 batch: DataFrame, keys: Seq[String], tsCol: String,
                 valueCol: String, tiebreakCol: String, target: Double,
                 slack: Double, threshold: Double,
                 scale: Double = 1e6): DataFrame = {
    val done = committedCusumVersions(spark, stateDir)
    if (done.contains(batchId)) return cusumScores(spark, stateDir)
    val carry = done.lastOption match {
      case Some(v) => spark.read.parquet(s"$stateDir/v=$v/carry")
      case None => emptyCusumCarry(spark, keys)
    }
    val (scored, carry2) = cusumFold(carry, batch, keys, tsCol, valueCol,
      tiebreakCol, target, slack, threshold, scale)
    scored.write.mode("overwrite").parquet(s"$stateDir/scores/batch=$batchId")
    carry2.write.mode("overwrite").parquet(s"$stateDir/v=$batchId/carry")
    val f = indexFs(spark, stateDir)
    f.mkdirs(new org.apache.hadoop.fs.Path(s"$stateDir/_commits"))
    f.create(new org.apache.hadoop.fs.Path(s"$stateDir/_commits/$batchId"),
      true).close()
    done.dropRight(1).foreach { old =>
      f.delete(new org.apache.hadoop.fs.Path(s"$stateDir/v=$old"), true)
    }
    cusumScores(spark, stateDir)
  }

  /** Every committed batch's CUSUM scores — the union of the
    * `scores/batch=<id>` logs (uncommitted/torn batch dirs prune at the
    * listing via the partition column). Row shape =
    * [[Relational.cusumDetect]]'s. */
  def cusumScores(spark: SparkSession, stateDir: String): DataFrame = {
    val done = committedCusumVersions(spark, stateDir)
    require(done.nonEmpty, s"cusumScores: nothing committed at $stateDir")
    spark.read.parquet(s"$stateDir/scores")
      .filter(col("batch").isin(done: _*))
      .drop("batch")
  }
}
