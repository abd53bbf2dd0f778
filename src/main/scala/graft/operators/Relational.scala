package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.{windows => W}

/** Relational building blocks the reference implements imperatively:
  * per-group top-N (A4/O3), side pivots (A1/A2), gap anti-joins (J3),
  * as-of/ffill alignment (J4), last-write-wins dedup (§2.7).
  */
object Relational {

  /** Default cap on a FORCED broadcast of an incremental-merge key set
    * (~a few tens of MB of key tuples — comfortably inside executor
    * memory, far above any sane batch). */
  val DefaultBroadcastMaxKeys: Long = 4000000L

  /** Broadcast a key-set frame only when it is provably small. The
    * `broadcast` hint OVERRIDES Spark's size check, so an unconditional
    * hint turns a full-reload batch (key set ≈ the dimension itself)
    * into a driver/executor OOM. Above the cap we drop the hint and let
    * the planner + AQE pick the join — shuffle semi/anti at worst.
    *
    * The gate counts `limit(maxKeys+1)` rather than the full set, so the
    * oversized case can stop as soon as the cap is provably exceeded
    * instead of paying a complete distinct count. It IS an eager action
    * at plan-construction time, and the joins re-derive the key set (no
    * `persist` — this function can't own an unpersist lifecycle); that
    * one extra batch-sized pass is the price of not OOMing on the
    * pathological batch. `maxKeys <= 0` means never force. */
  private def maybeBroadcast(keySet: DataFrame, maxKeys: Long): DataFrame = {
    if (maxKeys <= 0) return keySet
    // caps past limit()'s Int range can't use the early-out; pay the
    // full count rather than silently disabling the guard (clamping the
    // limit to Int.MaxValue would make the gate vacuously true)
    val small =
      if (maxKeys >= Int.MaxValue - 1) keySet.count() <= maxKeys
      else keySet.limit(maxKeys.toInt + 1).count() <= maxKeys
    if (small) broadcast(keySet) else keySet
  }

  /** Per-group top-N by an ordering — the order-book "top 5 levels"
    * pattern (`adi/app/features/processors/orderbook_features.py:73-91`).
    * row_number over a partitioned window: single shuffle on the group
    * keys, no driver involvement. */
  def topNPerGroup(df: DataFrame, groupKeys: Seq[String], order: Seq[Column], n: Int,
                   rankCol: String = "rn"): DataFrame = {
    val w = Window.partitionBy(groupKeys.map(col): _*).orderBy(order: _*)
    df.withColumn(rankCol, row_number().over(w)).filter(col(rankCol) <= n)
  }

  /** Pivot-sum by a category column with fixed values (A1,
    * `orderbook_features.py:104-118`): `groupBy(idx).pivot(cat, values)
    * .sum(value)`, absent combos filled 0. Fixed value list keeps it a
    * single pass (no distinct-values pre-query). */
  def pivotSum(df: DataFrame, idx: Seq[String], cat: String, values: Seq[String],
               value: String): DataFrame =
    df.groupBy(idx.map(col): _*).pivot(cat, values).sum(value).na.fill(0.0, values)

  /** Expected-grid gap detection (J3, `adi/app/features/jobs/backfill.py:45-76`):
    * build the dense expected timestamp grid per key with `sequence()`
    * (distributed — no driver loop, unlike the reference's Python range)
    * and anti-join what's stored. Returns the missing (keys, ts) rows. */
  def missingFromGrid(stored: DataFrame, keys: Seq[String], tsCol: String,
                      stepSec: Long): DataFrame = {
    val grid = stored
      .groupBy(keys.map(col): _*)
      .agg(min(col(tsCol)).as("_mn"), max(col(tsCol)).as("_mx"))
      .select(keys.map(col) :+
        explode(sequence(col("_mn"), col("_mx"), expr(s"interval $stepSec seconds"))).as(tsCol): _*)
    grid.join(stored.select((keys :+ tsCol).map(col): _*).distinct(),
      keys :+ tsCol, "left_anti")
  }

  /** Last-write-wins upsert dedup on key columns (§2.7 — the Redis
    * per-key overwrite semantics, `redis_store.py:184-192`): keep the
    * newest row per key by (orderCol desc, tiebreak desc). */
  def lastWriteWins(df: DataFrame, keys: Seq[String], order: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order.map(_.desc): _*)
    df.withColumn("_rn", row_number().over(w)).filter(col("_rn") === 1).drop("_rn")
  }

  /** As-of forward-fill alignment of a sparse column onto a dense axis
    * (J4, `orderbook_features.py:133-137`): full outer on the axis then
    * ffill — here generalized as "ffill this column over this window". */
  def ffillColumn(df: DataFrame, colName: String, partitionKeys: Seq[String],
                  orderBy: Seq[String]): DataFrame =
    df.withColumn(colName, W.ffill(col(colName), W.series(partitionKeys, orderBy)))

  // ------------------------------------------------------------------
  // Skew tools. AQE splits skewed SORT-MERGE join partitions at runtime,
  // and map-side partial aggregation already spreads hot keys for
  // algebraic aggregates — but a skewed shuffled-hash/bucketed join, or
  // a skewed key under an AQE-ineligible join, still funnels one
  // reducer. Classic key salting covers those at 100 TB scale.
  // ------------------------------------------------------------------

  /** One-pass column profiling — the data-quality report every pipeline
    * run should emit before training consumes its output: one row per
    * input column with `(n_rows, n_nulls, n_distinct, min/max)`.
    * Numeric, boolean, and timestamp columns report min/max on a double
    * scale (timestamps as epoch-µs, the engine's cross-engine timestamp
    * convention); string columns report binary-collation min/max
    * strings; each family's other slots are null.
    *
    * Scale shape: ONE aggregation job over the input. The exact
    * distinct counts ride Spark's multi-count-distinct Expand (one
    * shuffle whose width is the column count — at 100 TB swap
    * `count_distinct` for `approx_count_distinct`, same plan minus the
    * Expand; exact is the right default for a correctness-gated
    * profile). The per-column explosion happens on the single
    * aggregated row, never on the data. */
  def profile(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.types._
    val fields = df.schema.fields.toSeq
    require(fields.nonEmpty, "profile of a zero-column frame")
    def numView(f: StructField): Option[Column] = f.dataType match {
      case _: NumericType => Some(col(f.name).cast("double"))
      case TimestampType => Some(unix_micros(col(f.name)).cast("double"))
      case BooleanType => Some(col(f.name).cast("int").cast("double"))
      case _ => None
    }
    val aggs: Seq[Column] = count(lit(1)).cast("long").as("n_rows") +:
      fields.flatMap { f =>
        val n = f.name
        val mn = numView(f).getOrElse(lit(null).cast("double"))
        val ms = if (f.dataType == StringType) col(n) else lit(null).cast("string")
        Seq(
          sum(when(col(n).isNull, 1L).otherwise(0L)).cast("long").as(s"${n}__nulls"),
          count_distinct(col(n)).cast("long").as(s"${n}__distinct"),
          min(mn).as(s"${n}__min_num"), max(mn).as(s"${n}__max_num"),
          min(ms).as(s"${n}__min_str"), max(ms).as(s"${n}__max_str"))
      }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val structs = array(fields.map { f =>
      val n = f.name
      struct(lit(n).as("column"),
        col(s"${n}__nulls").as("n_nulls"), col(s"${n}__distinct").as("n_distinct"),
        col(s"${n}__min_num").as("min_num"), col(s"${n}__max_num").as("max_num"),
        col(s"${n}__min_str").as("min_str"), col(s"${n}__max_str").as("max_str"))
    }: _*)
    one.select(col("n_rows"), explode(structs).as("p"))
      .select(col("p.column").as("column"), col("n_rows"), col("p.n_nulls"),
        col("p.n_distinct"), col("p.min_num"), col("p.max_num"),
        col("p.min_str"), col("p.max_str"))
  }

  /** Per-group equi-width histograms — the data-profiling companion to
    * [[profile]]: `bins` equal-width buckets between each group's exact
    * min and max, EVERY bin emitted (zero counts included) so the output
    * is a dense plotting/monitoring grid. Two aggregations over the same
    * keys (bounds, then bucket counts) and a broadcast of the group-sized
    * bounds frame — the value column is scanned twice, shuffled never
    * (bucket counts combine map-side onto ≤ keys×bins rows). Bucket
    * arithmetic is the same IEEE double tree on both engines (floor of
    * one division); `bin_lo`/`bin_hi` are rounded to 6dp for output
    * stability. Groups with max == min collapse into bucket 0. */
  /** Shared equi-width bucket expression: `⌊(v − mn)/width⌋` clamped to
    * `[0, bins)`, bucket 0 when the range is degenerate — the exact
    * double tree [[histogramBy]] and [[psiDrift]] both replay in SQL
    * (keep them on ONE definition so bucketing can't silently diverge). */
  private[operators] def equiWidthBucket(v: Column, mn: Column, mx: Column,
                                         bins: Int): Column = {
    val width = (mx - mn) / lit(bins.toDouble)
    when(mx === mn, lit(0L))
      .otherwise(greatest(lit(0L),
        least(lit(bins - 1L), floor((v - mn) / width).cast("long"))))
  }

  def histogramBy(df: DataFrame, keys: Seq[String], valueCol: String,
                  bins: Int): DataFrame = {
    require(bins > 0, s"bins must be positive, got $bins")
    val v = col(valueCol).cast("double")
    val bounds = df.where(v.isNotNull)
      .groupBy(keys.map(col): _*).agg(min(v).as("_mn"), max(v).as("_mx"))
    val bucket = equiWidthBucket(v, col("_mn"), col("_mx"), bins)
    val counts = df.where(v.isNotNull)
      .join(broadcast(bounds), keys)
      .groupBy(keys.map(col) :+ bucket.as("bin"): _*)
      .agg(count(lit(1)).as("bin_count"))
    val grid = bounds.select(keys.map(col) :+ col("_mn") :+ col("_mx") :+
        explode(sequence(lit(0L), lit(bins - 1L))).as("bin"): _*)
    grid.join(counts, keys :+ "bin", "left")
      .select(keys.map(col) :+ col("bin") :+
        round(col("_mn") + col("bin") * ((col("_mx") - col("_mn")) / lit(bins.toDouble)), 6).as("bin_lo") :+
        round(col("_mn") + (col("bin") + 1L) * ((col("_mx") - col("_mn")) / lit(bins.toDouble)), 6).as("bin_hi") :+
        coalesce(col("bin_count"), lit(0L)).as("bin_count"): _*)
  }

  /** Population-stability-index feature drift (PSI) per key between a
    * REFERENCE slice and a CURRENT slice of one numeric column — the
    * standard model-monitoring "has this feature moved" score
    * (`PSI = Σ_bins (p_cur − p_ref)·ln(p_cur/p_ref)`; rule of thumb:
    * < 0.1 stable, 0.1–0.25 drifting, > 0.25 shifted). The numeric
    * sibling of [[TextAnalysis.sourceDivergence]]'s unigram KL.
    *
    * Bin edges derive from the REFERENCE slice only (the scorecard
    * convention — drift is measured against where the model was fit):
    * `bins` equi-width cells over the reference min/max; current values
    * outside the reference range clamp into the edge cells, so novel
    * mass is seen, not dropped. Empty cells get add-½ smoothing (the
    * [[TextAnalysis.importanceResample]] rule) so a vanished or novel
    * cell contributes a finite, engine-stable term.
    *
    * Determinism: per-cell terms quantize to `round(term·10⁹)` BIGINTs
    * and the PSI is their EXACT integer sum — order-free — divided back
    * once; identical double trees feed the `ln` on every engine (the
    * proven µnat pattern). Keys with no reference rows are absent from
    * the output (nothing to measure against — surface them upstream); a
    * DEGENERATE reference (min == max) fails loudly — it cannot anchor
    * bins and would report ~0 drift on any shift.
    *
    * Scale shape: one reference bounds agg (key-cardinality, broadcast
    * back), ONE grouped count over (keys, bin) with map-side combine,
    * and key-sized joins; the corpus is scanned twice, never sorted or
    * widely shuffled. */
  def psiDrift(df: DataFrame, keys: Seq[String], valueCol: String,
               isRef: Column, bins: Int = 10): DataFrame = {
    require(bins > 0, s"bins must be positive, got $bins")
    val v = col(valueCol).cast("double")
    val bounds = df.where(isRef && v.isNotNull)
      .groupBy(keys.map(col): _*).agg(min(v).as("_mn"), max(v).as("_mx"))
    // a single-valued reference slice cannot anchor bins: EVERY current
    // value would clamp into cell 0 and a 100× shift would read as
    // psi ≈ 0 — a monitoring operator must fail loudly, not reassure
    val degenerate = bounds.where(col("_mx") === col("_mn"))
      .select(keys.map(col): _*).limit(5).collect()
    require(degenerate.isEmpty,
      s"psiDrift: degenerate reference slice (min == max) for key(s) " +
        s"${degenerate.mkString(", ")} — bins cannot resolve drift there; " +
        "widen the reference window or exclude these keys")
    val bucket = equiWidthBucket(v, col("_mn"), col("_mx"), bins)
    val counts = df.where(v.isNotNull)
      .join(broadcast(bounds), keys)
      .groupBy(keys.map(col) :+ bucket.as("bin"): _*)
      .agg(count(when(isRef, lit(1))).as("c_ref"),
        count(when(!isRef, lit(1))).as("c_cur"))
    // full bin grid (empty cells carry smoothing mass) + per-key totals
    val grid = bounds.select(keys.map(col) :+
      explode(sequence(lit(0L), lit(bins - 1L))).as("bin"): _*)
    val cells = grid.join(counts, keys :+ "bin", "left")
      .select(keys.map(col) :+ col("bin") :+
        coalesce(col("c_ref"), lit(0L)).as("c_ref") :+
        coalesce(col("c_cur"), lit(0L)).as("c_cur"): _*)
    psiFromCells(cells, keys, bins)
  }

  /** Smoothing + fixed-point PSI fold over a dense `(keys…, bin, c_ref,
    * c_cur)` cell grid — ONE definition shared by the batch [[psiDrift]]
    * and the streaming [[DriftMonitor]] so the two paths are equivalent
    * by construction (same add-½ smoothing, same `round(term·10⁹)`
    * quantization, same exact integer sum). */
  private[operators] def psiFromCells(cells: DataFrame, keys: Seq[String],
                                      bins: Int): DataFrame = {
    val totals = cells.groupBy(keys.map(col): _*)
      .agg(sum("c_ref").as("n_ref"), sum("c_cur").as("n_cur"))
    val pr = (col("c_ref").cast("double") + lit(0.5)) /
      (col("n_ref").cast("double") + lit(bins.toDouble) * 0.5)
    val pc = (col("c_cur").cast("double") + lit(0.5)) /
      (col("n_cur").cast("double") + lit(bins.toDouble) * 0.5)
    cells.join(broadcast(totals), keys)
      .withColumn("_term_fp", round((pc - pr) * log(pc / pr) * 1e9).cast("long"))
      .groupBy(keys.map(col): _*)
      .agg(first("n_ref").as("n_ref"), first("n_cur").as("n_cur"),
        (sum("_term_fp").cast("double") / 1e9).as("psi"))
      .orderBy(keys.map(col): _*)
  }

  /** Two-sided CUSUM changepoint detector (Page 1954, Biometrika 41) per
    * series — the sequential mean-shift monitor that fires long before a
    * full-window [[psiDrift]] rescore:
    * `S⁺_t = max(0, S⁺_{t−1} + (x_t − target − slack))` and
    * `S⁻_t = max(0, S⁻_{t−1} + (target − x_t − slack))`, alarm when
    * either exceeds `threshold`. The max(0,·) recursion looks
    * sequential, but reflects into pure prefix algebra:
    * `S_t = P_t − min(0, min_{j≤t} P_j)` with `P` the running increment
    * sum — so the whole detector is ONE cumulative-sum window + ONE
    * running-min window per side, no driver loop, no state store.
    *
    * NON-RESETTING variant (the relational-friendly reading): after an
    * alarm the statistic keeps accumulating rather than restarting at 0,
    * so `alarm_pos/alarm_neg` mark every row in excursion; callers who
    * want classical reset-after-alarm semantics filter to the first
    * alarmed row per excursion downstream.
    *
    * Determinism: values/target/slack/threshold all quantize to
    * `⌊·scale⌋` BIGINTs, so P, the running min, and both statistics are
    * EXACT integers — the only doubles are the final `/scale` displays
    * (6 dp); the alarm compares exact integers, so it can never flip
    * cross-engine. Nulls drop before the order forms.
    *
    * Scale shape: both sides ride ONE series-keyed sort (two logical
    * windows, same partitioning/ordering → one physical exchange+sort).
    * Returns `(keys…, tsCol, tiebreakCol, value, s_pos, s_neg,
    * alarm_pos, alarm_neg)` ordered by (keys, ts, tiebreak). */
  def cusumDetect(df: DataFrame, keys: Seq[String], tsCol: String,
                  valueCol: String, tiebreakCol: String, target: Double,
                  slack: Double, threshold: Double,
                  scale: Double = 1e6): DataFrame = {
    require(keys.nonEmpty, "cusumDetect needs the series key(s)")
    require(slack >= 0.0, s"slack must be >= 0, got $slack")
    require(threshold > 0.0, s"threshold must be positive, got $threshold")
    require(scale > 0.0, s"scale must be positive, got $scale")
    val tq = math.floor(target * scale).toLong
    val kq = math.floor(slack * scale).toLong
    val hq = math.floor(threshold * scale).toLong
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(tsCol), col(tiebreakCol))
      .rowsBetween(Window.unboundedPreceding, 0)
    val xq = floor(col(valueCol).cast("double") * scale).cast("long")
    val base = df.where(col(valueCol).isNotNull)
      .withColumn("_xq", xq)
      .withColumn("_ip", col("_xq") - lit(tq) - lit(kq))
      .withColumn("_in", lit(tq) - col("_xq") - lit(kq))
    val scored = base
      .withColumn("_pp", sum(col("_ip")).over(w))
      .withColumn("_pn", sum(col("_in")).over(w))
      .withColumn("_sp", col("_pp") - least(lit(0L), min(col("_pp")).over(w)))
      .withColumn("_sn", col("_pn") - least(lit(0L), min(col("_pn")).over(w)))
    scored.select(keys.map(col) ++ Seq(col(tsCol), col(tiebreakCol),
        round(col("_xq").cast("double") / lit(scale), 6).as("value"),
        round(col("_sp").cast("double") / lit(scale), 6).as("s_pos"),
        round(col("_sn").cast("double") / lit(scale), 6).as("s_neg"),
        (col("_sp") > lit(hq)).as("alarm_pos"),
        (col("_sn") > lit(hq)).as("alarm_neg")): _*)
      .orderBy(keys.map(col) ++ Seq(col(tsCol), col(tiebreakCol)): _*)
  }

  /** Robust outlier detection per group — median/MAD flagging (the
    * monitoring pass that survives the heavy tails that break mean/σ
    * z-scores): a row is an outlier when
    * `|x − median| > k · 1.4826 · MAD` (1.4826 scales MAD to σ under
    * normality). Medians are EXACT percentiles — two grouped percentile
    * aggregations (values, then absolute deviations) whose per-group
    * memory is bounded by the group's distinct-value count; at 100 TB
    * with high-cardinality value columns switch `approxAccuracy` on to
    * use `percentile_approx` (sketch-bounded memory, same plan shape).
    * Returns only the flagged rows with their `robust_z` (rounded 6dp;
    * the flag itself compares unrounded doubles — the same IEEE tree on
    * any engine). Groups with MAD = 0 (over half the mass on one value)
    * flag nothing rather than dividing by zero. */
  def madOutliers(df: DataFrame, keys: Seq[String], valueCol: String,
                  k: Double = 3.0,
                  approxAccuracy: Option[Int] = None): DataFrame = {
    require(k > 0.0, s"k must be positive, got $k")
    val v = col(valueCol).cast("double")
    def pct(c: Column): Column = approxAccuracy match {
      case Some(acc) => percentile_approx(c, lit(0.5), lit(acc))
      case None => percentile(c, lit(0.5))
    }
    val med = df.where(v.isNotNull)
      .groupBy(keys.map(col): _*).agg(pct(v).as("_med"))
    val dev = df.where(v.isNotNull).join(broadcast(med), keys)
      .withColumn("_dev", abs(v - col("_med")))
    val mad = dev.groupBy(keys.map(col): _*).agg(pct(col("_dev")).as("_mad"))
    dev.join(broadcast(mad), keys)
      .where(col("_mad") > 0.0 && col("_dev") > lit(k) * (lit(1.4826) * col("_mad")))
      .withColumn("robust_z", round(col("_dev") / (lit(1.4826) * col("_mad")), 6))
      .withColumn("med", round(col("_med"), 6))
      .withColumn("mad", round(col("_mad"), 6))
      .drop("_med", "_dev", "_mad")
  }

  /** Per-group winsorization — clamp values into the group's
    * `[loPct, hiPct]` exact (interpolated) percentile band, the
    * standard fat-tail feature-prep step next to [[madOutliers]]'
    * flagging: outliers aren't dropped (information loss) or kept raw
    * (gradient/estimator poisoning), they saturate. Exact percentiles
    * by default (the [[madOutliers]] determinism story — Spark
    * `percentile` ≡ DuckDB `quantile_cont`); pass `approxAccuracy` for
    * the 100-TB sketch path (memory ∝ accuracy, not distinct values).
    * Null values drop (no band membership to decide).
    *
    * Scale shape: one grouped percentile agg to a key-sized bounds
    * frame, broadcast back, pure projection — the corpus never
    * shuffles. Returns the input columns plus `v_winsor` (clamped,
    * 6 dp) and `was_clipped`. */
  def winsorize(df: DataFrame, keys: Seq[String], valueCol: String,
                loPct: Double = 0.01, hiPct: Double = 0.99,
                approxAccuracy: Option[Int] = None): DataFrame = {
    require(loPct >= 0.0 && hiPct <= 1.0 && loPct < hiPct,
      s"need 0 <= loPct < hiPct <= 1, got $loPct/$hiPct")
    val v = col(valueCol).cast("double")
    def pct(p: Double): Column = approxAccuracy match {
      case Some(acc) => percentile_approx(v, lit(p), lit(acc))
      case None => percentile(v, lit(p))
    }
    val bounds = df.where(v.isNotNull)
      .groupBy(keys.map(col): _*)
      .agg(pct(loPct).as("_lo"), pct(hiPct).as("_hi"))
    df.where(v.isNotNull).join(broadcast(bounds), keys)
      .withColumn("v_winsor", round(least(greatest(v, col("_lo")), col("_hi")), 6))
      .withColumn("was_clipped", v < col("_lo") || v > col("_hi"))
      .drop("_lo", "_hi")
  }

  /** Gap-based sessionization — the canonical event-pipeline operator:
    * within each entity, a new session starts when the gap to the
    * previous event exceeds `gapSec`. Two stacked windows on the SAME
    * `(keys, orderBy ts)` spec (boundary flag via lag, session ordinal
    * via running sum) → one shuffle, one sort, per-entity parallelism —
    * the 100 TB shape; a global sessionizer would serialize. Returns one
    * row per session: keys, `session_id` (0-based per entity),
    * `n_events`, `start_us`/`end_us` (epoch-µs BIGINTs, the engine's
    * cross-engine timestamp convention), `duration_us`. */
  def sessionize(df: DataFrame, keys: Seq[String], tsCol: String,
                 gapSec: Long): DataFrame = {
    require(keys.nonEmpty, "sessionization needs entity keys (global = serialized)")
    require(gapSec > 0, s"gapSec must be positive, got $gapSec")
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col(tsCol))
    val us = unix_micros(col(tsCol))
    val newSession = when(
      us - lag(us, 1).over(w) > gapSec * 1000000L || lag(us, 1).over(w).isNull,
      lit(1L)).otherwise(lit(0L))
    df.withColumn("_ns", newSession)
      .withColumn("session_id", sum(col("_ns")).over(w) - 1)
      .groupBy((keys.map(col) :+ col("session_id")): _*)
      .agg(count(lit(1)).as("n_events"),
        min(us).as("start_us"), max(us).as("end_us"))
      .withColumn("duration_us", col("end_us") - col("start_us"))
  }

  /** Gap-sessionization generalized to weighted INTERVALS: rows are
    * `(keys, startUs, endUs, n)` and two intervals merge when the gap
    * between one's start and the running max end of everything before
    * it is ≤ `gapSec` (running max, not lag — an interval can swallow
    * its successors entirely, so the previous ROW's end is not the
    * session frontier). Point events are intervals with start = end.
    * Same one-shuffle shape as [[sessionize]]. */
  def sessionizeIntervals(df: DataFrame, keys: Seq[String],
                          startCol: String, endCol: String, nCol: String,
                          gapSec: Long): DataFrame = {
    require(keys.nonEmpty, "sessionization needs entity keys")
    require(gapSec > 0, s"gapSec must be positive, got $gapSec")
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(startCol), col(endCol))
    val frontier = max(col(endCol))
      .over(w.rowsBetween(Window.unboundedPreceding, -1))
    val newSession = when(
      frontier.isNull || col(startCol) - frontier > gapSec * 1000000L,
      lit(1L)).otherwise(lit(0L))
    df.withColumn("_ns", newSession)
      .withColumn("session_id", sum(col("_ns")).over(w) - 1)
      .groupBy((keys.map(col) :+ col("session_id")): _*)
      .agg(sum(col(nCol)).as("n_events"),
        min(col(startCol)).as("start_us"), max(col(endCol)).as("end_us"))
      .withColumn("duration_us", col("end_us") - col("start_us"))
  }

  /** Incremental sessionization — fold a new batch of events into a
    * stored session table WITHOUT recomputing untouched users: only the
    * batch's entities reload their stored sessions (as weighted
    * intervals; bounds + counts are sufficient statistics for gap
    * merging), merge with the new points through
    * [[sessionizeIntervals]] (a new event may BRIDGE two stored
    * sessions — the interval form handles that), and everyone else
    * passes through untouched. Provably ≡ re-sessionizing the full
    * event history (spec gate), at the cost of the batch's users only —
    * the feature-store affected-partition pattern applied to sessions.
    * Assumes exactly-once event delivery; replayed events re-count
    * (document upstream dedup). */
  def mergeSessions(stored: DataFrame, newEvents: DataFrame,
                    keys: Seq[String], tsCol: String,
                    gapSec: Long,
                    broadcastMaxKeys: Long = DefaultBroadcastMaxKeys): DataFrame = {
    val us = unix_micros(col(tsCol))
    val affected = maybeBroadcast(
      newEvents.select(keys.map(col): _*).distinct(), broadcastMaxKeys)
    val pts = newEvents.select(keys.map(col) ++ Seq(us.as("_s"), us.as("_e"),
      lit(1L).as("_n")): _*)
    val reopened = stored.join(affected, keys)
      .select(keys.map(col) ++ Seq(col("start_us").as("_s"),
        col("end_us").as("_e"), col("n_events").as("_n")): _*)
    val merged = sessionizeIntervals(reopened.unionByName(pts), keys,
      "_s", "_e", "_n", gapSec)
    val untouched = stored.join(affected, keys, "left_anti")
      .select((keys :+ "session_id" :+ "n_events" :+ "start_us" :+ "end_us"
        :+ "duration_us").map(col): _*)
    untouched.unionByName(merged.select(untouched.columns.map(col): _*))
  }

  /** SCD2 dimension-history merge — the warehouse "slowly changing
    * dimension" operator: fold an update stream into a versioned
    * dimension table where each row is a `[eff_from_us, eff_to_us)`
    * validity interval and the open version has `eff_to_us` null. The
    * core is run-length compression of the per-key version stream:
    * versions ordered by `(eff_from, attrs)` keep only rows whose
    * attributes differ from their predecessor (null-safe, every attr),
    * then `eff_to = lead(eff_from)` rebuilds the contiguous chain. The
    * fold is IDEMPOTENT (replaying the same updates changes nothing),
    * and under per-key TIME-ORDERED batches (every update at-or-after
    * the key's stored history — the standard warehouse load contract)
    * incremental folds ≡ one full fold over the raw stream, the
    * [[mergeSessions]] contract. Late updates inside a CLOSED run are
    * the one case compression cannot absorb (the run's dropped repeats
    * are gone); such rewinds need a rebuild from the raw event log —
    * [[scd2Init]] over the key's full history.
    *
    * Scale shape: only keys PRESENT in the update batch reload their
    * stored history (semi/anti on the batch's key set — broadcast only
    * below [[DefaultBroadcastMaxKeys]], see [[maybeBroadcast]]: a
    * full-reload batch must not force an unbounded broadcast);
    * untouched keys pass through without a shuffle. The
    * compression itself is two stacked windows on one `(keys)` spec —
    * one exchange, per-key parallelism, nothing key-quadratic. */
  def scd2Merge(stored: DataFrame, updates: DataFrame, keys: Seq[String],
                attrCols: Seq[String], tsCol: String,
                broadcastMaxKeys: Long = DefaultBroadcastMaxKeys): DataFrame = {
    require(keys.nonEmpty, "scd2Merge needs dimension keys")
    require(attrCols.nonEmpty, "scd2Merge needs tracked attribute columns")
    val affected = maybeBroadcast(
      updates.select(keys.map(col): _*).distinct(), broadcastMaxKeys)
    val up = updates.select(keys.map(col) ++ attrCols.map(col) :+
      unix_micros(col(tsCol)).as("eff_from_us"): _*)
    val reopened = stored.join(affected, keys, "left_semi")
      .select(keys.map(col) ++ attrCols.map(col) :+ col("eff_from_us"): _*)
    val recompressed = scd2Compress(reopened.unionByName(up), keys, attrCols)
    val untouched = stored.join(affected, keys, "left_anti")
      .select(keys.map(col) ++ attrCols.map(col) :+
        col("eff_from_us") :+ col("eff_to_us"): _*)
    untouched.unionByName(recompressed)
  }

  /** Build an SCD2 dimension from scratch (no stored history): run-length
    * compression of the raw update stream. See [[scd2Merge]]. */
  def scd2Init(updates: DataFrame, keys: Seq[String],
               attrCols: Seq[String], tsCol: String): DataFrame =
    scd2Compress(updates.select(keys.map(col) ++ attrCols.map(col) :+
      unix_micros(col(tsCol)).as("eff_from_us"): _*), keys, attrCols)

  private def scd2Compress(versions: DataFrame, keys: Seq[String],
                           attrCols: Seq[String]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("eff_from_us") +: attrCols.map(col): _*)
    val anyChanged = attrCols.map(a => not(col(a) <=> lag(col(a), 1).over(w)))
      .reduce(_ || _)
    versions.distinct()
      .withColumn("_rn", row_number().over(w))
      .withColumn("_chg", anyChanged)
      .where(col("_rn") === 1 || col("_chg"))
      .withColumn("eff_to_us", lead(col("eff_from_us"), 1).over(w))
      .drop("_rn", "_chg")
  }

  /** Cohort retention — the activity-grid companion to [[funnel]]:
    * users cohort by their FIRST-activity bucket (epoch-time floor
    * division by `bucketSec`, exact integer arithmetic), and each
    * (cohort, offset) cell counts the distinct users active `offset`
    * buckets after their cohort start. `offset = 0` is the cohort size
    * (every user is active in their first bucket by construction).
    *
    * Scale shape: one keyed agg for first-activity, one distinct over
    * skinny `(user, bucket)` rows, one count agg — no window over the
    * raw events, nothing user-quadratic. Returns
    * `(cohort_bucket, offset, n_users)`. */
  def cohortRetention(df: DataFrame, userCol: String, tsCol: String,
                      bucketSec: Long): DataFrame = {
    require(bucketSec > 0, s"bucketSec must be positive, got $bucketSec")
    // integer floor chain (div, not fp division) so the bucketing is
    // exact and matches the oracle's `//`
    val bucket = expr(s"(unix_micros($tsCol) div 1000000) div $bucketSec")
    val act = df.select(col(userCol).as("user_id"),
      bucket.cast("long").as("bucket")).distinct()
    val cohort = act.groupBy("user_id").agg(min("bucket").as("cohort_bucket"))
    act.join(cohort, "user_id")
      .groupBy(col("cohort_bucket"),
        (col("bucket") - col("cohort_bucket")).as("offset"))
      .agg(count_distinct(col("user_id")).as("n_users"))
  }

  /** Windowed funnel analysis over an event stream — "how far down
    * signup → click → purchase does each user get, within `withinSec`
    * of their first step?" Earliest-anchor semantics, fully
    * deterministic: t₁ is the user's EARLIEST step-1 event; each later
    * tᵢ is the earliest step-i event strictly after tᵢ₋₁ and within the
    * window of t₁; a missing step nulls every later step.
    * `funnel_level` = how many steps completed (≥1 by construction —
    * only users with a step-1 anchor appear; left-join the user
    * universe for zero-level rows).
    *
    * Scale shape: per step one filtered scan (`typeCol` equality pushes
    * to the source) + one keyed aggregation — rows entering each round
    * are only that step's events, the accumulator stays one row per
    * anchored user, and nothing ever fans out quadratically (the
    * candidate join is user-keyed, pruned by the min aggregate in the
    * same stage). Steps are sequential rounds like [[graft.operators.Dedup.connectedComponents]]'
    * propagation — O(|steps|) stages, each shuffle-bounded by the
    * step's event count. */
  def funnel(df: DataFrame, userCol: String, tsCol: String, typeCol: String,
             steps: Seq[String], withinSec: Long): DataFrame = {
    require(steps.size >= 2, s"a funnel needs ≥2 steps, got ${steps.size}")
    require(steps.distinct.size == steps.size, "funnel steps must be distinct")
    require(withinSec > 0, s"withinSec must be positive, got $withinSec")
    val ev = df.select(col(userCol).as("user_id"), col(typeCol).as("_et"),
      unix_micros(col(tsCol)).as("_us"))
    var acc = ev.filter(col("_et") === steps.head)
      .groupBy("user_id").agg(min("_us").as("t1"))
    for (i <- 2 to steps.size) {
      val si = ev.filter(col("_et") === steps(i - 1))
        .select(col("user_id"), col("_us").as("_si"))
      val prev = (1 until i).map(j => s"t$j")
      acc = acc.join(si, Seq("user_id"), "left")
        .groupBy("user_id", prev: _*)
        .agg(min(when(col("_si") > col(s"t${i - 1}") &&
          col("_si") <= col("t1") + lit(withinSec * 1000000L),
          col("_si"))).as(s"t$i"))
    }
    val level = steps.indices
      .map(i => when(col(s"t${i + 1}").isNotNull, 1L).otherwise(0L))
      .reduce(_ + _)
    acc.withColumn("funnel_level", level)
  }

  /** Salted equi-join of a skew-keyed big side against a
    * too-big-to-broadcast small side: the big side's rows get a
    * deterministic salt in [0, saltBuckets), the small side is
    * replicated once per salt value, and the join key becomes
    * (keys, salt) — a hot key's rows spread over `saltBuckets` reducers
    * instead of one. Result is row-identical to the unsalted join for
    * join types that preserve each small-side row at most once per big
    * match (inner/left/semi/anti on the big side); right and full outer
    * are rejected — replication would emit `saltBuckets` null-padded
    * copies of an unmatched small-side row.
    * The salt hashes the whole row (a monotonic id would break
    * determinism under task retries). Use when AQE's skew split can't
    * apply (shuffled-hash joins, bucketed tables) — broadcast the small
    * side instead whenever it fits. */
  /** Pairwise Pearson correlation matrix across aligned series — the
    * cross-asset co-movement grid (BTC↔ETH return correlation, the
    * standard portfolio/risk view over the reference's market feeds) and
    * equally the feature-redundancy screen for a training matrix.
    *
    * Input is long-form `(keyCol, tsCol, valueCol)` with ONE row per
    * key per aligned bucket (resample first — [[Resample.resampleAgg]]
    * produces exactly this shape). Every pair `key_a < key_b` is
    * correlated over the buckets BOTH series populate (inner join —
    * missing buckets drop pairwise, the pandas `corr` convention).
    *
    * Determinism contract: values quantize to `⌊v·scale⌋` BIGINTs and
    * the five moment sums (Σx, Σy, Σxy, Σx², Σy²) accumulate as exact
    * integers — order-free under any partitioning — then r derives in
    * one fixed double expression, rounded to 6 dp. Overflow contract:
    * callers pick `scale` so `n·(scale·max|v|)² < 2⁶³` (the default 10⁶
    * suits return-scale series; pass 10⁴ for price-scale, 10² for
    * index-level). Degenerate (zero-variance) legs yield null r, not
    * NaN.
    *
    * Scale shape: one equi-join on the bucket key over skinny
    * `(t, k, v)` rows — series count per bucket is the SMALL dimension
    * (symbols/features, not corpus), so the per-bucket pair fan-out is
    * k², bounded and tiny; the moment agg is map-side combined onto
    * ≤ k² keys. Nothing corpus-wide sorts or broadcasts. */
  /** Shared quantized series frame for the correlation family
    * ([[correlationMatrix]]/[[leadLagCorr]]/[[acf]]): null values drop
    * (they must not count toward n) and the rest quantize to
    * `⌊v·scale⌋` BIGINTs — ONE definition of the contract the three
    * oracles replay.
    *
    * KEY TYPING CONTRACT: `keyCol` is cast to STRING, so output key
    * columns are string-typed and pair orientation / ordering is
    * LEXICOGRAPHIC (`key_a < key_b` as strings: "10" < "2"). Correlation
    * values are symmetric so numbers are unaffected, but callers with
    * numeric series keys who need numeric ordering should zero-pad or
    * re-cast downstream. One canonical type keeps the pair predicate and
    * the DuckDB oracle's comparison semantics identical. */
  /** Spearman rank information coefficient per group — THE signal-
    * evaluation number (rank correlation of a signal against its
    * forward return, per rebalance bucket; Grinold & Kahn's IC): rank
    * both columns with AVERAGE ranks on ties (the Spearman convention —
    * `rank + (ties−1)/2`, kept as the EXACT integer `2·rank + ties − 1`
    * so no double enters the rank), then Pearson over the doubled ranks
    * from exact integer moment sums (doubling cancels in the ratio).
    *
    * Determinism: ranks and all five moment sums are exact BIGINTs; the
    * correlation derives in one fixed double tree (the
    * [[correlationMatrix]] shape), 6 dp. Rows where either column is
    * null drop (no rank). Constant columns → null IC.
    * Overflow contract: Σ(2r)² ≤ 4n³ per group ⇒ n ≤ 10⁶ rows/group
    * (an IC bucket is a rebalance period — thousands of names, not
    * millions; shard the bucket key if yours is bigger).
    *
    * Scale shape: two rank windows (one sort per variable — inherent to
    * Spearman) + tie counts riding the same partitionings, then one
    * map-side-combined agg to one row per group. No joins, nothing
    * global. */
  def spearmanIc(df: DataFrame, keys: Seq[String], xCol: String,
                 yCol: String): DataFrame = {
    require(keys.nonEmpty, "spearmanIc needs the bucket key(s)")
    val x = col(xCol).cast("double")
    val y = col(yCol).cast("double")
    val wx = Window.partitionBy(keys.map(col): _*).orderBy(col(xCol))
    val wy = Window.partitionBy(keys.map(col): _*).orderBy(col(yCol))
    val cx = Window.partitionBy((keys.map(col) :+ col(xCol)): _*)
    val cy = Window.partitionBy((keys.map(col) :+ col(yCol)): _*)
    val ranked = df.where(x.isNotNull && y.isNotNull)
      .withColumn("_ra", lit(2L) * rank().over(wx).cast("long")
        + count(lit(1)).over(cx) - lit(1L))
      .withColumn("_rb", lit(2L) * rank().over(wy).cast("long")
        + count(lit(1)).over(cy) - lit(1L))
    val n = col("_n").cast("double")
    def d(c: Column): Column = c.cast("double")
    val cov = n * d(col("_sab")) - d(col("_sa")) * d(col("_sb"))
    val va = n * d(col("_saa")) - d(col("_sa")) * d(col("_sa"))
    val vb = n * d(col("_sbb")) - d(col("_sb")) * d(col("_sb"))
    ranked.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("_n"),
        sum(col("_ra")).as("_sa"), sum(col("_rb")).as("_sb"),
        sum(col("_ra") * col("_ra")).as("_saa"),
        sum(col("_rb") * col("_rb")).as("_sbb"),
        sum(col("_ra") * col("_rb")).as("_sab"))
      .select(keys.map(col) ++ Seq(col("_n").as("n"),
        when(va > 0.0 && vb > 0.0,
          round(cov / sqrt(va * vb), 6)).as("ic")): _*)
      .orderBy(keys.map(col): _*)
  }

  /** Fama–MacBeth two-step factor regression (1973, JPE 81) — the OLS
    * companion of [[spearmanIc]]: per bucket (period), regress the
    * forward return on the signal ACROSS the cross-section
    * (`λ_b = cov(x,y)/var(x)`); then the factor premium is the
    * time-series mean of the per-period slopes with its t-statistic
    * `t = λ̄·√B/σ_λ` (the FM standard errors — cross-sectional
    * correlation washes out because each period contributes ONE draw).
    *
    * Determinism: x and y quantize to `⌊·xScale⌋`/`⌊·yScale⌋` BIGINTs →
    * five exact first-stage moment sums per bucket; the slope derives in
    * one fixed double tree (de-scaled by `xScale/yScale`); second-stage
    * slopes re-quantize to `round(λ·10⁹)` nano-units and their mean/σ
    * come from exact integer sums again — order-free at both levels.
    * Zero-variance buckets (constant x) drop before the second stage.
    * Returns ONE row: `(n_buckets, lambda_mean, lambda_t)`; per-bucket
    * slopes are [[famaMacbethSlopes]] (the same first stage — shared so
    * the two can't diverge).
    *
    * Scale shape: one map-side-combined (bucket) agg over the corpus →
    * a bucket-sized frame → one global agg of three longs. Nothing
    * sorts, nothing joins. */
  def famaMacbeth(df: DataFrame, bucketCol: String, xCol: String,
                  yCol: String, xScale: Double = 1e6,
                  yScale: Double = 1e6): DataFrame = {
    // the unsorted first stage — a global aggregate follows, so the
    // user-facing orderBy of famaMacbethSlopes would be a wasted range
    // exchange here
    val slopes = fmSlopes(df, bucketCol, xCol, yCol, xScale, yScale)
      .withColumn("_l_fp", round(col("lambda") * 1e9).cast("long"))
    val b = col("n_buckets").cast("double")
    val mean = col("_s1").cast("double") / 1e9 / b
    val variance = col("_s2").cast("double") / 1e9 / b - mean * mean
    slopes.agg(count(lit(1)).as("n_buckets"),
        sum(col("_l_fp")).as("_s1"),
        sum(round((col("_l_fp").cast("double") / 1e9)
          * (col("_l_fp").cast("double") / 1e9) * 1e9).cast("long")).as("_s2"))
      .select(col("n_buckets"),
        round(mean, 6).as("lambda_mean"),
        when(variance > 0.0,
          round(mean * sqrt(b) / sqrt(variance), 6)).as("lambda_t"))
  }

  /** First stage of [[famaMacbeth]]: per-bucket cross-sectional OLS
    * slope + intercept from exact integer moments. Returns
    * `(bucketCol, n, lambda, intercept)`, constant-x buckets dropped. */
  def famaMacbethSlopes(df: DataFrame, bucketCol: String, xCol: String,
                        yCol: String, xScale: Double = 1e6,
                        yScale: Double = 1e6): DataFrame =
    fmSlopes(df, bucketCol, xCol, yCol, xScale, yScale)
      .orderBy(col(bucketCol))

  private def fmSlopes(df: DataFrame, bucketCol: String, xCol: String,
                       yCol: String, xScale: Double,
                       yScale: Double): DataFrame = {
    require(xScale > 0.0 && yScale > 0.0, "scales must be positive")
    val x = col(xCol).cast("double")
    val y = col(yCol).cast("double")
    def d(c: Column): Column = c.cast("double")
    val n = d(col("_n"))
    val varX = n * d(col("_sxx")) - d(col("_sx")) * d(col("_sx"))
    val cov = n * d(col("_sxy")) - d(col("_sx")) * d(col("_sy"))
    // slope in quantized units scales by yScale/xScale; de-scale back
    val slope = cov / varX * lit(xScale / yScale)
    val intercept = (d(col("_sy")) / lit(yScale)
      - (cov / varX * lit(xScale / yScale)) * (d(col("_sx")) / lit(xScale))) / n
    df.where(x.isNotNull && y.isNotNull)
      .select(col(bucketCol),
        floor(x * lit(xScale)).cast("long").as("_xq"),
        floor(y * lit(yScale)).cast("long").as("_yq"))
      .groupBy(col(bucketCol))
      .agg(count(lit(1)).as("_n"),
        sum(col("_xq")).as("_sx"), sum(col("_yq")).as("_sy"),
        sum(col("_xq") * col("_xq")).as("_sxx"),
        sum(col("_xq") * col("_yq")).as("_sxy"))
      .where(varX > 0.0)
      .select(col(bucketCol), col("_n").as("n"),
        round(slope, 6).as("lambda"),
        round(intercept, 6).as("intercept"))
  }

  private def quantizedBase(df: DataFrame, keyCol: String, tsCol: String,
                            valueCol: String, scale: Double): DataFrame = {
    require(scale > 0.0, s"scale must be positive, got $scale")
    df.where(col(valueCol).isNotNull)
      .select(col(keyCol).cast("string").as("_k"), col(tsCol).as("_t"),
        floor(col(valueCol).cast("double") * scale).cast("long").as("_v"))
  }

  def correlationMatrix(df: DataFrame, keyCol: String, tsCol: String,
                        valueCol: String, scale: Double = 1e6): DataFrame = {
    val base = quantizedBase(df, keyCol, tsCol, valueCol, scale)
    val paired = base.as("x").join(base.as("y"),
        col("x._t") === col("y._t") && col("x._k") < col("y._k"))
      .select(col("x._k").as("key_a"), col("y._k").as("key_b"),
        col("x._v").as("_xa"), col("y._v").as("_xb"))
    momentCorr(paired, Seq("key_a", "key_b"))
      .orderBy("key_a", "key_b")
  }

  /** Shared moment-sum → Pearson-r reduction: group `(_xa, _xb)` pairs
    * by `keys`, accumulate the five EXACT integer moment sums, derive r
    * in one fixed double tree (null on a zero-variance leg). Backs
    * [[correlationMatrix]] and [[leadLagCorr]]. */
  private def momentCorr(paired: DataFrame, keys: Seq[String]): DataFrame = {
    val sums = paired.groupBy(keys.map(col): _*).agg(
      count(lit(1)).as("n"),
      sum("_xa").as("_sx"), sum("_xb").as("_sy"),
      sum(col("_xa") * col("_xb")).as("_sxy"),
      sum(col("_xa") * col("_xa")).as("_sxx"),
      sum(col("_xb") * col("_xb")).as("_syy"))
    // exact-integer-derived doubles: the identical expression tree on
    // any engine (n·Σxy − ΣxΣy) / √(n·Σx²−(Σx)²)·√(n·Σy²−(Σy)²)
    val nD = col("n").cast("double")
    val cov = nD * col("_sxy").cast("double") -
      col("_sx").cast("double") * col("_sy").cast("double")
    val va = nD * col("_sxx").cast("double") -
      col("_sx").cast("double") * col("_sx").cast("double")
    val vb = nD * col("_syy").cast("double") -
      col("_sy").cast("double") * col("_sy").cast("double")
    sums.select(keys.map(col) ++ Seq(col("n"),
      when(va > 0.0 && vb > 0.0,
        round(cov / (sqrt(va) * sqrt(vb)), 6)).as("corr")): _*)
  }

  /** Lead-lag cross-correlation: Pearson r between series a at bucket t
    * and series b at bucket `t + lag`, for every pair and every
    * `lag ∈ [−maxLag, maxLag]` — "does a lead b, and by how much?" (the
    * cross-market lead discovery the one-lag-zero [[correlationMatrix]]
    * can't see; a positive-lag peak means a's moves precede b's).
    *
    * `bucketCol` must be an INTEGRAL bucket index (epoch-hours, bar
    * number — callers derive it with exact integer division, never a
    * float divide). Same determinism contract as [[correlationMatrix]]:
    * `⌊v·scale⌋` BIGINT moments, fixed double tree, 6 dp.
    *
    * Scale shape: the x side replicates per lag (2·maxLag+1 skinny
    * copies — series rows, not corpus), one bucket equi-join on the
    * SHIFTED index, moment agg onto pairs·lags keys. */
  def leadLagCorr(df: DataFrame, keyCol: String, bucketCol: String,
                  valueCol: String, maxLag: Int,
                  scale: Double = 1e6): DataFrame = {
    require(maxLag >= 1, s"maxLag must be >= 1, got $maxLag")
    val base = quantizedBase(df, keyCol, bucketCol, valueCol, scale)
      .withColumn("_t", col("_t").cast("long"))
    val lagged = base.withColumn("lag",
        explode(sequence(lit(-maxLag), lit(maxLag))))
      .withColumn("lag", col("lag").cast("long"))
    val paired = lagged.as("x").join(base.as("y"),
        col("y._t") === col("x._t") + col("lag") && col("x._k") < col("y._k"))
      .select(col("x._k").as("key_a"), col("y._k").as("key_b"), col("lag"),
        col("x._v").as("_xa"), col("y._v").as("_xb"))
    momentCorr(paired, Seq("key_a", "key_b", "lag"))
      .orderBy("key_a", "key_b", "lag")
  }

  /** Per-series autocorrelation function: Pearson r between a series and
    * ITSELF at lag 1..maxLag — mean-reversion vs momentum structure per
    * key (the self-pair complement of [[leadLagCorr]], which only ever
    * pairs distinct keys). Same contract throughout: integral bucket
    * indexes, `⌊v·scale⌋` BIGINT moments via [[momentCorr]], pairs
    * correlate over the buckets where both ends exist.
    *
    * Scale shape: the series replicates per lag (maxLag skinny copies of
    * series rows), one shifted equi-join on (key, bucket), moment agg
    * onto keys·lags rows. */
  def acf(df: DataFrame, keyCol: String, bucketCol: String,
          valueCol: String, maxLag: Int, scale: Double = 1e6): DataFrame = {
    require(maxLag >= 1, s"maxLag must be >= 1, got $maxLag")
    val base = quantizedBase(df, keyCol, bucketCol, valueCol, scale)
      .withColumn("_t", col("_t").cast("long"))
    val lagged = base.withColumn("lag",
        explode(sequence(lit(1), lit(maxLag))))
      .withColumn("lag", col("lag").cast("long"))
    val paired = lagged.as("x").join(base.as("y"),
        col("y._k") === col("x._k") &&
          col("y._t") === col("x._t") + col("lag"))
      .select(col("x._k").as("key"), col("lag"),
        col("x._v").as("_xa"), col("y._v").as("_xb"))
    momentCorr(paired, Seq("key", "lag")).orderBy("key", "lag")
  }

  /** Moment layer of [[neweyWest]], shared with the Diebold–Mariano
    * wrapper: from an already-quantized `(_k, _t: long, _v: long)`
    * series frame, the per-key `(key, n, _mu, _lrvq)` — mean and
    * Bartlett long-run variance IN QUANTIZED UNITS, unrounded, both
    * fixed double trees from exact DECIMAL(38) integer sums (callers
    * pick their own display scaling/rounding). */
  private[graft] def neweyWestMoments(base: DataFrame, maxLag: Int)
      : DataFrame = {
    require(maxLag >= 1, s"maxLag must be >= 1, got $maxLag")
    val D38 = org.apache.spark.sql.types.DecimalType(38, 0)
    val tot = base.groupBy(col("_k").as("key"))
      .agg(count(lit(1)).as("n"), sum(col("_v").cast(D38)).as("sv"))
    val lagged = base.withColumn("lag",
        explode(sequence(lit(0), lit(maxLag))))
      .withColumn("lag", col("lag").cast("long"))
    val paired = lagged.as("x").join(base.as("y"),
        col("y._k") === col("x._k") &&
          col("y._t") === col("x._t") + col("lag"))
      .select(col("x._k").as("key"), col("lag"),
        col("x._v").as("_xa"), col("y._v").as("_xb"))
    val perLag = paired.groupBy(col("key"), col("lag")).agg(
      count(lit(1)).as("nl"),
      sum(col("_xa").cast(D38)).as("sa"),
      sum(col("_xb").cast(D38)).as("sb"),
      sum(col("_xa").cast(D38) * col("_xb")).as("sxy"))
    def cell(c: String, l: Int): Column =
      max(when(col("lag") === l.toLong, col(c))).as(s"${c}$l")
    val cells = (0 to maxLag).flatMap(l =>
      Seq(cell("nl", l), cell("sa", l), cell("sb", l), cell("sxy", l)))
    val piv = perLag.groupBy(col("key")).agg(cells.head, cells.tail: _*)
    val j = tot.join(piv, "key")
    val nd = col("n").cast("double")
    val mu = col("sv").cast("double") / nd
    def gamma(l: Int): Column =
      (col(s"sxy$l").cast("double") -
        mu * (col(s"sa$l").cast("double") + col(s"sb$l").cast("double")) +
        col(s"nl$l").cast("double") * (mu * mu)) / nd
    val lrvQ = (1 to maxLag).foldLeft(gamma(0)) { (acc, l) =>
      acc + lit(2.0 * (1.0 - l.toDouble / (maxLag + 1.0))) * gamma(l)
    }
    j.select(col("key"), col("n"), mu.as("_mu"), lrvQ.as("_lrvq"))
  }

  /** Newey–West (1987) HAC long-run variance of a per-key series, with
    * the Bartlett kernel — the autocorrelation-robust scale every
    * serially-dependent mean test needs (drift tests, Diebold–Mariano
    * forecast comparisons, overlapping-return alphas):
    *
    * {{{ lrv = γ̂₀ + 2·Σ_{l=1..L} (1 − l/(L+1))·γ̂_l
    *     γ̂_l = (1/n)·Σ_{t>l} (v_t − μ)(v_{t−l} − μ),  μ = Σv/n }}}
    *
    * Bartlett weights make the estimate PSD by construction, so
    * `se = √(lrv/n)` is always real. With `diff = true` the test runs
    * on the FIRST DIFFERENCE of the (quantized) series — the drift
    * test "is the per-step change nonzero under HAC errors" — and the
    * differencing happens in exact-integer space (`Δq = q_t − q_{t−1}`
    * on contiguous buckets), so no second float quantization.
    *
    * Determinism contract (the [[acf]]/[[correlationMatrix]] family):
    * `⌊v·scale⌋` BIGINT images; every per-lag reduction (`n_l`,
    * `Σ v_t`, `Σ v_{t−l}`, `Σ v_t·v_{t−l}`) is an exact DECIMAL(38,0)
    * integer sum — order-free under any partitioning; each γ̂_l then
    * expands around the rational mean as ONE fixed double tree
    * `(Σxy − μ·(Σa + Σb) + n_l·μ²)/n` from exact integers, the lags
    * fold left-associated with literal Bartlett weights, outputs round
    * to 6 dp. Overflow: `scale²·max|v|²·n < 10³⁸` — at the default
    * 10⁴ scale that is |v| ≲ 10¹¹/√n, far beyond any 2-dp input.
    *
    * Scale shape: the series replicates per lag (maxLag+1 skinny
    * copies of SERIES rows — buckets, not corpus), one shifted
    * equi-join on (key, bucket), map-side-combined integer moment aggs
    * onto keys·lags rows, then a keys-sized pivot (`max(when(lag=l))`
    * — at most one row per cell) so the lag fold is a fixed
    * expression, never an order-dependent float SUM.
    *
    * Returns `(key, n, mean_v, lrv, se_mean, t_mean)` — all in
    * ORIGINAL value units (t is unit-free); `t_mean` null when the
    * series is degenerate (lrv ≤ 0). */
  def neweyWest(df: DataFrame, keyCol: String, bucketCol: String,
                valueCol: String, maxLag: Int, scale: Double = 1e4,
                diff: Boolean = true): DataFrame = {
    val base0 = quantizedBase(df, keyCol, bucketCol, valueCol, scale)
      .withColumn("_t", col("_t").cast("long"))
    val base =
      if (!diff) base0
      else base0.as("a").join(base0.as("b"),
          col("b._k") === col("a._k") && col("b._t") === col("a._t") + 1L)
        .select(col("a._k").as("_k"), (col("a._t") + 1L).as("_t"),
          (col("b._v") - col("a._v")).as("_v"))
    val m = neweyWestMoments(base, maxLag)
    val nd = col("n").cast("double")
    val mu = col("_mu")
    val lrvQ = col("_lrvq")
    m.select(col("key"), col("n"),
        (round(mu / lit(scale), 6) + lit(0.0)).as("mean_v"),
        (round(lrvQ / lit(scale) / lit(scale), 6) + lit(0.0)).as("lrv"),
        when(lrvQ > 0.0,
          round(sqrt(lrvQ / nd) / lit(scale), 6) + lit(0.0)).as("se_mean"),
        when(lrvQ > 0.0,
          round(mu / sqrt(lrvQ / nd), 6) + lit(0.0)).as("t_mean"))
      .orderBy("key")
  }

  /** Ledoit–Wolf shrunk covariance matrix — the well-conditioned
    * estimator `Σ* = (1−δ)·S + δ·μI` of Ledoit & Wolf 2004 ("A
    * well-conditioned estimator for large-dimensional covariance
    * matrices", J. Multivariate Analysis 88) in the scaled-identity-
    * target form: the sample covariance S is pulled toward μI
    * (μ = tr(S)/N) with the analytically optimal intensity
    * `δ = min(1, β/d²)`, where `d² = ‖S − μI‖²_F/N` (dispersion of S
    * around the target) and `β = (1/TN)·Σ_t ‖x_t x_tᵀ − S‖²_F`
    * (sampling noise of S). Completes the portfolio-risk kit next to
    * [[correlationMatrix]]: raw S from T≲N-ish samples is
    * ill-conditioned and inverts explosively; the shrunk Σ* is what a
    * minimum-variance optimizer should consume.
    *
    * Input is long-form `(keyCol, tsCol, valueCol)`, one row per key
    * per aligned bucket ([[Resample.resampleAgg]] shape). The matrix
    * statistics need one common T, so the panel is COMPLETE-CASE:
    * only buckets where every series is present (and non-null) enter
    * — unlike [[correlationMatrix]]'s pairwise-complete convention.
    *
    * Determinism contract — the TWO-LEVEL quantizer (a single-level
    * ⌊v·scale⌋ contract cannot survive the 4th-order moment
    * `Σ_t (x_i x_j)²`: its integer sums need (scale·|v|)⁴·T < 2⁶³,
    * which collapses `scale` to useless coarseness — the round-7
    * shelving reason):
    *  1. values quantize to `q = ⌊v·scale⌋` BIGINTs; per-key sums
    *     `S_k = Σq` are exact integers, so the centered numerator
    *     `c = T·q − S_k` is exact (no rational mean ever materializes);
    *  2. each per-bucket pair product re-quantizes:
    *     `z = ⌊(c_a/(T·scale))·(c_b/(T·scale))·pairScale⌋` — one fixed
    *     double tree from exact integers, then BIGINT again;
    *  3. every cross-bucket and cross-pair reduction is exact-integer:
    *     Σz and Σz² per pair as BIGINT, the Frobenius accumulations
    *     `Σ wt·u²` / `Σ wt·(T·Σz² − (Σz)²)` as DECIMAL(38,0)
    *     (HUGEINT on the DuckDB side) — order-free under any
    *     partitioning; scalars (μ, d², β, δ) derive in one fixed
    *     double expression at the very end, outputs round to 6 dp.
    * Overflow contract: pick `scale` so `T·scale·max|v| < 2⁶²` and
    * `pairScale` so `T·(pairScale·max|x_c x_c|)² < 2⁶³` with centered
    * magnitudes `|x_c| ≤ 2·max|v|` (default 10⁶/10⁶ suits return-scale
    * series; price-scale data wants 10⁴/10²).
    *
    * Scale shape: one bucket equi-join over skinny `(t, k, c)` rows
    * onto `key_a ≤ key_b` pairs (series count is the SMALL dimension
    * by the correlation-family contract) and map-side-combined integer
    * moment aggs onto ≤ N(N+1)/2 keys, plus two skinny countDistinct
    * pre-scans for the N/T scalars; the matrix-level Frobenius
    * reductions fold the ≤ N(N+1)/2 collected pair rows in driver
    * BigInt arithmetic (the centroid-collect precedent). Nothing
    * corpus-wide sorts; T can be 100 TB of history without changing
    * the plan.
    *
    * Returns `(key_a, key_b, n, cov, shrunk_cov, shrinkage, mu)` for
    * every `key_a ≤ key_b` (diagonal included); `shrinkage`/`mu` are
    * matrix-level constants repeated per row. Covariances are the
    * BIASED (/T) sample moments, the LW-paper normalization. */
  /** Shared complete-case panel → level-2-quantized pair-product frame
    * for the Ledoit–Wolf family: returns `(N, T, pzt)` with `pzt` =
    * `(key_a ≤ key_b, _t, _z)`, one µ-quantized centered pair product
    * per complete bucket (diagonal pairs included). See
    * [[ledoitWolfCovariance]] for the full contract. */
  private def lwPanelZ(df: DataFrame, keyCol: String, tsCol: String,
                       valueCol: String, scale: Double,
                       pairScale: Double): (Long, Long, DataFrame) = {
    require(pairScale > 0.0, s"pairScale must be positive, got $pairScale")
    val base = quantizedBase(df, keyCol, tsCol, valueCol, scale)
    // N (series count) and T (complete buckets) are collected as driver
    // scalars up front — two skinny countDistinct pre-scans. NOT a
    // crossJoin of the one-row aggregates back onto `base`: joining an
    // aggregate against its own lineage leaks the subtree's attribute
    // NAMES into the resolution scope (Spark 4 hidden-column
    // resolution), making every later unqualified `_t`/`_k` reference
    // AMBIGUOUS_REFERENCE. Bucket completeness and per-key sums are
    // WINDOW aggregates for the same reason (and one fewer shuffle than
    // groupBy-and-join-back).
    val nL = base.select(countDistinct(col("_k"))).head().getLong(0)
    val aligned = base
      .withColumn("_bc", count(lit(1)).over(Window.partitionBy(col("_t"))))
      .where(col("_bc") === lit(nL)).drop("_bc")
    val tL = aligned.select(countDistinct(col("_t"))).head().getLong(0)
    val centered = aligned
      .withColumn("_S", sum(col("_v")).over(Window.partitionBy(col("_k"))))
      .select(col("_k"), col("_t"),
        (lit(tL) * col("_v") - col("_S")).as("_c"))
    // level-2 quantization of the per-bucket pair product (distinct
    // column names per side, the correlationMatrix self-join shape)
    val cx = centered.select(col("_k").as("key_a"), col("_t").as("_ta"),
      col("_c").as("_ca"))
    val cy = centered.select(col("_k").as("key_b"), col("_t").as("_tb"),
      col("_c").as("_cb"))
    val ts = lit(tL.toDouble * scale)
    val pzt = cx.join(cy,
        col("_ta") === col("_tb") && col("key_a") <= col("key_b"))
      .select(col("key_a"), col("key_b"), col("_ta").as("_t"),
        floor((col("_ca").cast("double") / ts) *
          (col("_cb").cast("double") / ts) * lit(pairScale))
          .cast("long").as("_z"))
    (nL, tL, pzt)
  }

  def ledoitWolfCovariance(df: DataFrame, keyCol: String, tsCol: String,
                           valueCol: String, scale: Double = 1e6,
                           pairScale: Double = 1e6): DataFrame = {
    val (nL, tL, pzt) = lwPanelZ(df, keyCol, tsCol, valueCol, scale, pairScale)
    val pa = pzt.groupBy(col("key_a"), col("key_b")).agg(
        sum(col("_z")).as("_w"), sum(col("_z") * col("_z")).as("_w2"))
      .localCheckpoint(true) // materialized once; two consumers below
    // The matrix-level Frobenius reductions run on the DRIVER in exact
    // BigInt arithmetic over the checkpointed pair frame — ≤ N(N+1)/2
    // rows by the series-count contract (the centroid-collect
    // precedent), already materialized, and BigInt sums are order-free
    // like the DECIMAL(38)/HUGEINT aggregates they replace. μ, d², β, δ
    // then derive in the same fixed double tree the oracle replays.
    val rows = pa.collect()
    def isDiag(r: org.apache.spark.sql.Row) =
      r.getAs[String]("key_a") == r.getAs[String]("key_b")
    val wd = rows.filter(isDiag).map(r => BigInt(r.getAs[Long]("_w"))).sum
    var dnum = BigInt(0); var bnum = BigInt(0)
    rows.foreach { r =>
      val d = isDiag(r)
      val w = BigInt(r.getAs[Long]("_w")); val w2 = BigInt(r.getAs[Long]("_w2"))
      val wt = if (d) 1 else 2
      val u = BigInt(nL) * w - (if (d) wd else BigInt(0))
      dnum += u * u * wt
      bnum += (w2 * BigInt(tL) - w * w) * wt
    }
    val nD = nL.toDouble; val tD = tL.toDouble
    val mu = wd.doubleValue / (nD * tD * pairScale)
    // β/d² = bnum·N²/(dnum·T) — the s2/T/N normalizers cancel
    val sh = if (dnum > 0)
      math.min(1.0, bnum.doubleValue * nD * nD / (dnum.doubleValue * tD))
    else 0.0
    pa.withColumn("cov", col("_w").cast("double") /
        (lit(tD) * lit(pairScale)))
      .select(col("key_a"), col("key_b"), lit(tL).as("n"),
        round(col("cov"), 6).as("cov"),
        round(lit(1.0 - sh) * col("cov") + lit(sh * mu) *
            when(col("key_a") === col("key_b"), 1.0).otherwise(0.0), 6)
          .as("shrunk_cov"),
        round(lit(sh), 6).as("shrinkage"),
        round(lit(mu), 6).as("mu"))
      .orderBy("key_a", "key_b")
  }

  /** Ledoit–Wolf shrinkage toward the CONSTANT-CORRELATION target —
    * "Honey, I Shrunk the Sample Covariance Matrix" (Ledoit & Wolf
    * 2003, J. Portfolio Management 30(4)): the target keeps every
    * sample variance and replaces every correlation with the average
    * correlation r̄ (`f_ii = s_ii`, `f_ij = r̄·√(s_ii s_jj)`), and the
    * optimal intensity is `δ = max(0, min(1, κ/T))` with
    * `κ = (π̂ − ρ̂)/γ̂`: π̂ the summed asymptotic variances of the s_ij
    * (the [[ledoitWolfCovariance]] β numerators), γ̂ the squared
    * target distance, and ρ̂ the covariance between the estimation
    * errors of S and of the target — which needs the THIRD-order
    * moments `θ_ii,ij = (1/T)Σ_t (y_i² − s_ii)(y_i y_j − s_ij)`. The
    * finance-standard variant: variances stay honest, only the noisy
    * correlation structure shrinks.
    *
    * Determinism: the [[ledoitWolfCovariance]] two-level quantizer plus
    * a THIRD level for the scalar reductions. Level 2's µ-quantized
    * pair products keep their bucket key, so `Σ z_aa·z_ab` /
    * `Σ z_bb·z_ab` (the θ numerators) are exact BIGINT sums off one
    * 3-way bucket equi-join; the per-pair scalar terms (r_ab, π_ab,
    * ρ-term, γ-term) then derive in fixed double trees and quantize to
    * `⌊term·termScale⌋` BigInts, so the cross-pair Σ for r̄/π̂/ρ̂/γ̂ is
    * order-free (the CAR-cumulation doctrine; κ = (π̂q − ρ̂q)/γ̂q — the
    * termScale cancels). A zero-variance leg contributes r_ab = 0 and
    * no ρ/γ mass (pinned in the spec). Overflow contract: level 1/2 as
    * [[ledoitWolfCovariance]] plus `T·(pairScale·max|y_c y_c|)² < 2⁶³`
    * for the z products, and per-pair |term|·termScale within double's
    * exact-integer range for faithful level-3 precision.
    *
    * Scale shape: [[lwPanelZ]]'s bucket equi-join, one 3-way bucket
    * equi-join onto the DIAGONAL z rows (skinny: N·T rows broadcast
    * side), moment aggs onto pair keys, driver BigInt folds over
    * ≤ N(N+1)/2 collected rows. Returns
    * `(key_a, key_b, n, cov, shrunk_cov, shrinkage, r_bar)`. */
  def ledoitWolfConstCorr(df: DataFrame, keyCol: String, tsCol: String,
                          valueCol: String, scale: Double = 1e6,
                          pairScale: Double = 1e6,
                          termScale: Double = 1e6): DataFrame = {
    require(termScale > 0.0, s"termScale must be positive, got $termScale")
    val spark = df.sparkSession
    val (nL, tL, pzt0) = lwPanelZ(df, keyCol, tsCol, valueCol, scale, pairScale)
    val pzt = pzt0.localCheckpoint(true) // pair rows + two diagonal probes
    val dzA = pzt.where(col("key_a") === col("key_b"))
      .select(col("key_a").as("_ka"), col("_t").as("_taa"), col("_z").as("_zaa"))
    val dzB = pzt.where(col("key_a") === col("key_b"))
      .select(col("key_b").as("_kb"), col("_t").as("_tbb"), col("_z").as("_zbb"))
    val pa = pzt
      .join(broadcast(dzA),
        col("_ka") === col("key_a") && col("_taa") === col("_t"))
      .join(broadcast(dzB),
        col("_kb") === col("key_b") && col("_tbb") === col("_t"))
      .groupBy(col("key_a"), col("key_b")).agg(
        sum(col("_z")).as("_w"),
        sum(col("_z") * col("_z")).as("_w2"),
        sum(col("_zaa") * col("_z")).as("_ca"),
        sum(col("_zbb") * col("_z")).as("_cb"))
      .collect()
    val tD = tL.toDouble
    val den = tD * pairScale
    val den2 = den * den
    def q(x: Double): BigInt =
      BigDecimal.valueOf(math.floor(x * termScale)).toBigInt
    val diagW: Map[String, BigInt] = pa.toSeq
      .filter(r => r.getAs[String]("key_a") == r.getAs[String]("key_b"))
      .map(r => r.getAs[String]("key_a") -> BigInt(r.getAs[Long]("_w")))
      .toMap
    val sDiag: Map[String, Double] =
      diagW.map { case (k, w) => k -> w.doubleValue / den }
    final case class P(a: String, b: String, w: BigInt, w2: BigInt,
                       ca: BigInt, cb: BigInt) {
      val s: Double = w.doubleValue / den
      val pi: Double = (BigInt(tL) * w2 - w * w).doubleValue / den2
      def thA: Double = (BigInt(tL) * ca - diagW(a) * w).doubleValue / den2
      def thB: Double = (BigInt(tL) * cb - diagW(b) * w).doubleValue / den2
    }
    val ps: Seq[P] = pa.toSeq.map(r => P(r.getAs[String]("key_a"),
      r.getAs[String]("key_b"), BigInt(r.getAs[Long]("_w")),
      BigInt(r.getAs[Long]("_w2")), BigInt(r.getAs[Long]("_ca")),
      BigInt(r.getAs[Long]("_cb"))))
    def ok(p: P): Boolean = sDiag(p.a) > 0.0 && sDiag(p.b) > 0.0
    val off = ps.filter(p => p.a != p.b)
    // r̄ — level-3 quantized cross-pair sum (order-free)
    val rbarQ = off.map(p =>
      if (ok(p)) q(p.s / math.sqrt(sDiag(p.a) * sDiag(p.b))) else BigInt(0)).sum
    val rbar =
      if (nL >= 2) (rbarQ.doubleValue / termScale) * 2.0 / (nL.toDouble * (nL - 1).toDouble)
      else 0.0
    val piQ = ps.map(p => q(p.pi) * (if (p.a == p.b) 1 else 2)).sum
    val rhoQ = ps.filter(p => p.a == p.b).map(p => q(p.pi)).sum +
      off.map { p =>
        if (!ok(p)) BigInt(0)
        else q(rbar * (math.sqrt(sDiag(p.b) / sDiag(p.a)) * p.thA +
          math.sqrt(sDiag(p.a) / sDiag(p.b)) * p.thB))
      }.sum
    val gamQ = off.map { p =>
      val f = if (ok(p)) rbar * math.sqrt(sDiag(p.a) * sDiag(p.b)) else 0.0
      val d = f - p.s
      q(d * d) * 2
    }.sum
    val delta =
      if (gamQ > 0)
        math.max(0.0, math.min(1.0,
          (piQ - rhoQ).doubleValue / gamQ.doubleValue / tD))
      else 0.0
    val out = ps.sortBy(p => (p.a, p.b)).map { p =>
      val f =
        if (p.a == p.b) sDiag(p.a)
        else if (ok(p)) rbar * math.sqrt(sDiag(p.a) * sDiag(p.b))
        else 0.0
      (p.a, p.b, tL, p.s, (1.0 - delta) * p.s + delta * f, delta, rbar)
    }
    import spark.implicits._
    out.toDF("key_a", "key_b", "n", "cov", "shrunk_cov", "shrinkage", "r_bar")
      .select(col("key_a"), col("key_b"), col("n"),
        round(col("cov"), 6).as("cov"),
        round(col("shrunk_cov"), 6).as("shrunk_cov"),
        round(col("shrinkage"), 6).as("shrinkage"),
        round(col("r_bar"), 6).as("r_bar"))
      .orderBy("key_a", "key_b")
  }

  /** PACF + Ljung–Box Q per series — the rest of the Box–Jenkins
    * identification kit next to [[acf]]: the partial autocorrelation
    * `φ_{k,k}` (correlation at lag k with lags 1..k−1 regressed out —
    * an AR(p) process cuts off after lag p, which raw ACF can't show)
    * via the Durbin–Levinson recursion over the ACF vector, and the
    * portmanteau `Q_h = n(n+2)·Σ_{k≤h} ρ̂_k²/(n−k)` whiteness statistic.
    *
    * Determinism contract: inputs are [[acf]]'s ROUNDED 6-dp
    * correlations (identical doubles cross-engine by the momentCorr
    * contract), the recursion is plain IEEE double arithmetic in a FIXED
    * fold order (j ascending, strict left folds — the oracle unrolls
    * the identical expression tree per lag level), and outputs round to
    * 6 dp. A null ρ_k (zero-variance leg) or an exactly-zero
    * Durbin–Levinson denominator nulls pacf/Q from that lag onward;
    * `n` for Q is the series' non-null observation count.
    *
    * Scale shape: the distributed work IS [[acf]] (skinny shifted
    * equi-join + integer moment agg) plus one count agg; the recursion
    * itself runs on the collected (series × maxLag) frame — series
    * count is the small dimension by the correlation-family contract
    * (the centroid/power-iteration precedent), and `maxKeys` fails
    * loudly if a caller points it at a corpus-keyed frame. Returns
    * `(key, lag, acf, pacf, q_lb)`, maxLag rows per series. */
  def pacfLjungBox(df: DataFrame, keyCol: String, bucketCol: String,
                   valueCol: String, maxLag: Int, scale: Double = 1e6,
                   maxKeys: Int = 65536): DataFrame = {
    require(maxLag >= 1 && maxLag <= 64, s"maxLag must be in [1,64], got $maxLag")
    val spark = df.sparkSession
    val aRows = acf(df, keyCol, bucketCol, valueCol, maxLag, scale)
      .select(col("key"), col("lag").cast("int").as("lag"), col("corr"))
      .limit(maxKeys * maxLag + 1).collect()
    require(aRows.length <= maxKeys * maxLag,
      s"pacfLjungBox saw more than maxKeys=$maxKeys series — the " +
        "Durbin–Levinson recursion is a driver pass over series×lags; " +
        "this input looks corpus-keyed")
    val nRows = quantizedBase(df, keyCol, bucketCol, valueCol, scale)
      .groupBy(col("_k")).agg(count(lit(1)).as("n")).collect()
    val nBy = nRows.map(r => r.getString(0) -> r.getLong(1)).toMap
    val rhoBy = aRows.groupBy(_.getString(0)).view.mapValues { rs =>
      val arr = Array.fill[Option[Double]](maxLag + 1)(None)
      rs.foreach(r => if (!r.isNullAt(2)) arr(r.getInt(1)) = Some(r.getDouble(2)))
      arr
    }.toMap
    def r6(v: Double): java.lang.Double =
      if (v.isNaN || v.isInfinite) null
      else java.math.BigDecimal.valueOf(v)
        .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
    val out = rhoBy.keys.toSeq.sorted.flatMap { key =>
      val rho = rhoBy(key)
      val n = nBy.getOrElse(key, 0L).toDouble
      // Durbin–Levinson: phiPrev(j) = φ_{k−1,j}
      val phiPrev = Array.fill(maxLag + 1)(0.0)
      var valid = true
      var acc = 0.0
      var accValid = true
      (1 to maxLag).map { k =>
        val pacf: java.lang.Double = rho(k) match {
          case Some(rk) if valid && k == 1 =>
            phiPrev(1) = rk; r6(rk)
          case Some(rk) if valid =>
            var num = 0.0; var den = 0.0
            var j = 1
            while (j < k) {
              num += phiPrev(j) * rho(k - j).getOrElse(Double.NaN)
              den += phiPrev(j) * rho(j).getOrElse(Double.NaN)
              j += 1
            }
            val numF = rk - num
            val denF = 1.0 - den
            if (denF == 0.0 || denF.isNaN || numF.isNaN) { valid = false; null }
            else {
              val kk = numF / denF
              val next = new Array[Double](maxLag + 1)
              j = 1
              while (j < k) { next(j) = phiPrev(j) - kk * phiPrev(k - j); j += 1 }
              next(k) = kk
              System.arraycopy(next, 0, phiPrev, 0, maxLag + 1)
              r6(kk)
            }
          case _ => valid = false; null
        }
        val q: java.lang.Double = rho(k) match {
          case Some(rk) if accValid && n - k > 0 =>
            acc += rk * rk / (n - k)
            r6(n * (n + 2.0) * acc)
          case _ => accValid = false; null
        }
        org.apache.spark.sql.Row(key, k.toLong,
          rho(k).map(Double.box).orNull, pacf, q)
      }
    }
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("key",
        org.apache.spark.sql.types.StringType, nullable = false),
      org.apache.spark.sql.types.StructField("lag",
        org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField("acf",
        org.apache.spark.sql.types.DoubleType, nullable = true),
      org.apache.spark.sql.types.StructField("pacf",
        org.apache.spark.sql.types.DoubleType, nullable = true),
      org.apache.spark.sql.types.StructField("q_lb",
        org.apache.spark.sql.types.DoubleType, nullable = true)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(out, 1), schema)
  }

  /** Lo–MacKinlay variance-ratio test per series — the random-walk
    * diagnostic completing the [[acf]]/[[pacfLjungBox]] kit:
    * `VR(q) = Var(q-period increment)/(q·Var(1-period increment))` over
    * OVERLAPPING q-period increments. A random walk gives VR ≈ 1;
    * momentum pushes it above, mean reversion below — the aggregate
    * answer the per-lag ACF spreads across lags. Also emits the
    * homoscedastic z-statistic
    * `z = (VR−1)/√(2(2q−1)(q−1)/(3qn))` (Lo & MacKinlay 1988 eq. 12).
    *
    * Contract (the correlation-family rules): `bucketCol` is an
    * INTEGRAL bucket index; values quantize to `⌊v·scale⌋` BIGINTs, so
    * every increment `v_{t} − v_{t−q}` (both ends present — gaps just
    * drop that increment) is an exact integer; population-variance
    * moment sums accumulate exactly and VR/z derive in one fixed double
    * tree, 6 dp. Null VR on a zero-variance 1-period leg.
    *
    * Scale shape: the series replicates per q (|qs| skinny copies — the
    * [[acf]] shape), one shifted (key, bucket) equi-join, exact moment
    * agg onto keys·qs rows, then a key-sized join against the q=1 leg.
    * Nothing corpus-wide. Returns `(key, q, n_incr, vr, z)`. */
  def varianceRatio(df: DataFrame, keyCol: String, bucketCol: String,
                    valueCol: String, qs: Seq[Int],
                    scale: Double = 1e6): DataFrame = {
    require(qs.nonEmpty && qs.forall(_ >= 2),
      s"qs must all be >= 2 (q=1 is the denominator leg), got $qs")
    require(qs.distinct.size == qs.size, s"duplicate qs: $qs")
    val base = quantizedBase(df, keyCol, bucketCol, valueCol, scale)
      .withColumn("_t", col("_t").cast("long"))
    val lags = (1 +: qs).map(_.toLong)
    val lagged = base.withColumn("q",
        explode(array(lags.map(lit): _*)))
    val diffs = lagged.as("x").join(base.as("y"),
        col("y._k") === col("x._k") &&
          col("y._t") === col("x._t") + col("q"))
      .select(col("x._k").as("key"), col("q"),
        (col("y._v") - col("x._v")).as("_d"))
    val moments = diffs.groupBy(col("key"), col("q"))
      .agg(count(lit(1)).as("n"),
        sum(col("_d")).as("_s1"), sum(col("_d") * col("_d")).as("_s2"))
    // population variance of a leg: (n·Σd² − (Σd)²)/n² — exact-integer
    // numerators, one double tree
    def popVarNum(n: Column, s1: Column, s2: Column): Column =
      n.cast("double") * s2.cast("double") -
        s1.cast("double") * s1.cast("double")
    val one = moments.where(col("q") === 1L)
      .select(col("key"), col("n").as("_n1"),
        col("_s1").as("_a1"), col("_s2").as("_a2"))
    val qLegs = moments.where(col("q") =!= 1L)
    val j = qLegs.join(one, "key")
    val varQ = popVarNum(col("n"), col("_s1"), col("_s2")) /
      (col("n").cast("double") * col("n").cast("double"))
    val var1 = popVarNum(col("_n1"), col("_a1"), col("_a2")) /
      (col("_n1").cast("double") * col("_n1").cast("double"))
    val qD = col("q").cast("double")
    val vr = varQ / qD / var1
    val z = (vr - lit(1.0)) /
      sqrt(lit(2.0) * (lit(2.0) * qD - lit(1.0)) * (qD - lit(1.0)) /
        (lit(3.0) * qD * col("_n1").cast("double")))
    j.select(col("key"), col("q"), col("n").as("n_incr"),
        when(var1 > 0.0, round(vr, 6)).as("vr"),
        when(var1 > 0.0 && col("_n1") > 0L, round(z, 6)).as("z"))
      .orderBy("key", "q")
  }

  /** Hurst exponent per series — the aggregated-variance estimator
    * (Taqqu, Teverovsky & Willinger 1995, Fractals 3(4)): for each
    * block size `m`, the increments of the level series aggregate over
    * NON-OVERLAPPING complete blocks of m consecutive buckets, and for
    * a self-similar process the block-sum variance grows as `m^{2H}` —
    * so the OLS slope of `ln Var(m)` on `ln m` is `2H`. H ≈ 0.5 is a
    * random walk, H > 0.5 long-memory persistence (trends persist),
    * H < 0.5 anti-persistence (mean reversion) — the long-range
    * complement to the per-horizon [[varianceRatio]] diagnostic.
    *
    * Contract (the correlation-family rules): `bucketCol` is an
    * INTEGRAL bucket index; values quantize to `⌊v·scale⌋` BIGINTs, so
    * increments (both endpoint buckets present — gaps drop the
    * increment and with it the block) and block sums are exact
    * integers, and each block-sum variance derives from exact moment
    * sums in one fixed double tree. A (key, m) leg survives only with
    * ≥ 2 complete blocks and a variance that is still positive after
    * `⌊var·10⁶⌋` quantization (the ln input both engines see is the
    * SAME double). The log–log fit is the level-3 quantized OLS (the
    * [[ledoitWolfConstCorr]] doctrine): per-leg terms `ln m`, `ln var`
    * and their products quantize to `⌊t·10⁹⌋` BIGINTs so the per-key
    * sums are order-free, and the slope derives in one fixed tree.
    * Overflow contract: `n_blocks·(m·scale·max|Δv|)² < 2⁶³` for the
    * block-sum second moment — size `scale` to the value range.
    *
    * Scale shape: one shifted (key, bucket) equi-join for the
    * increments, a ×|ms| skinny explode (the [[varianceRatio]] shape),
    * exact moment aggs onto (key, m, block) then (key, m), and a
    * key-sized window for the fit — nothing corpus-wide. Returns one
    * row per surviving (key, m): `(key, m, n_blocks, var_m, n_scales,
    * hurst)` with `hurst` the key-level constant (null when fewer than
    * 2 legs survive). */
  def hurstExponent(df: DataFrame, keyCol: String, bucketCol: String,
                    valueCol: String, ms: Seq[Int] = Seq(1, 2, 4, 8),
                    scale: Double = 1e6): DataFrame = {
    require(ms.nonEmpty && ms.forall(_ >= 1), s"ms must all be >= 1, got $ms")
    require(ms.distinct.size == ms.size, s"duplicate ms: $ms")
    val base = quantizedBase(df, keyCol, bucketCol, valueCol, scale)
      .withColumn("_t", col("_t").cast("long"))
    val incr = base.as("x").join(base.as("y"),
        col("y._k") === col("x._k") && col("y._t") === col("x._t") + 1L)
      .select(col("x._k").as("key"), col("y._t").as("_t"),
        (col("y._v") - col("x._v")).as("_d"))
    // exact BIGINT floor block id (buckets may be negative pre-epoch):
    // strip the positive remainder, then divide the exact multiple
    val withM = incr.withColumn("m", explode(array(ms.map(m => lit(m.toLong)): _*)))
      .withColumn("_blk",
        ((col("_t") - pmod(col("_t"), col("m"))) / col("m").cast("double"))
          .cast("long"))
    val blocks = withM.groupBy(col("key"), col("m"), col("_blk"))
      .agg(count(lit(1)).as("_cnt"), sum(col("_d")).as("_bs"))
      .where(col("_cnt") === col("m")) // complete blocks only
    val legs = blocks.groupBy(col("key"), col("m"))
      .agg(count(lit(1)).as("n_blocks"),
        sum(col("_bs")).as("_s1"), sum(col("_bs") * col("_bs")).as("_s2"))
      .where(col("n_blocks") >= 2L)
      // population variance of the block sums, back in value units —
      // quantized to ⌊·10⁶⌋ so both engines take ln of the SAME double
      .withColumn("_vq", floor(
        (col("n_blocks").cast("double") * col("_s2").cast("double") -
          col("_s1").cast("double") * col("_s1").cast("double")) /
          (col("n_blocks").cast("double") * col("n_blocks").cast("double")) /
          lit(scale * scale) * lit(1e6)).cast("long"))
      .where(col("_vq") > 0L)
      .withColumn("var_m", col("_vq").cast("double") / lit(1e6))
    // level-3 quantized log–log OLS terms (order-free BIGINT sums)
    val lx = log(col("m").cast("double"))
    val ly = log(col("var_m"))
    val terms = legs
      .withColumn("_xq", floor(lx * lit(1e9)).cast("long"))
      .withColumn("_yq", floor(ly * lit(1e9)).cast("long"))
      .withColumn("_xyq", floor(lx * ly * lit(1e9)).cast("long"))
      .withColumn("_xxq", floor(lx * lx * lit(1e9)).cast("long"))
    val wk = Window.partitionBy(col("key"))
    val fit = terms
      .withColumn("_ns", count(lit(1)).over(wk).cast("double"))
      .withColumn("_sx", sum(col("_xq")).over(wk).cast("double") / lit(1e9))
      .withColumn("_sy", sum(col("_yq")).over(wk).cast("double") / lit(1e9))
      .withColumn("_sxy", sum(col("_xyq")).over(wk).cast("double") / lit(1e9))
      .withColumn("_sxx", sum(col("_xxq")).over(wk).cast("double") / lit(1e9))
    val den = col("_ns") * col("_sxx") - col("_sx") * col("_sx")
    val slope = (col("_ns") * col("_sxy") - col("_sx") * col("_sy")) / den
    fit.select(col("key"), col("m"), col("n_blocks"),
        round(col("var_m"), 6).as("var_m"),
        col("_ns").cast("long").as("n_scales"),
        when(col("_ns") >= 2.0 && den > 0.0,
          round(slope / lit(2.0), 6)).as("hurst"))
      .orderBy("key", "m")
  }

  /** Wald–Wolfowitz runs test per series — the classic
    * distribution-free randomness check on the SIGN sequence of
    * first differences (is the tape a fair coin, or do up/down moves
    * cluster/alternate?): with `n₊` up-moves, `n₋` down-moves and `R`
    * observed runs (maximal same-sign blocks),
    *
    * {{{ μ_R = 2n₊n₋/n + 1
    *     σ²_R = 2n₊n₋(2n₊n₋ − n)/(n²(n−1)),   n = n₊ + n₋
    *     z = (R − μ_R)/σ_R }}}
    *
    * z ≪ 0 → trending (fewer, longer runs than chance), z ≫ 0 →
    * mean-reverting (excess alternation). Completes the
    * serial-dependence panel beside [[acf]]/[[neweyWest]] and the
    * variance-ratio test with a statistic that needs NO moment
    * assumptions. Zero differences drop (the standard binary-runs
    * convention); differencing runs on the exact quantized integers.
    *
    * Determinism: every input to the statistic (`n₊`, `n₋`, `R`) is an
    * exact integer — the z tree is the only float arithmetic, fixed
    * and identical in both engines; outputs round 6 dp.
    *
    * Scale shape: one shifted self-join (diffs), one keyed window pass
    * (run boundaries), one map-side-combined agg onto key rows. */
  def runsTest(df: DataFrame, keyCol: String, bucketCol: String,
               valueCol: String, scale: Double = 1e4): DataFrame = {
    val base = quantizedBase(df, keyCol, bucketCol, valueCol, scale)
      .withColumn("_t", col("_t").cast("long"))
    val d = base.as("a").join(base.as("b"),
        col("b._k") === col("a._k") && col("b._t") === col("a._t") + 1L)
      .select(col("a._k").as("key"), (col("a._t") + 1L).as("_t"),
        (col("b._v") - col("a._v")).as("_d"))
      .where(col("_d") =!= 0L)
      .withColumn("_s", when(col("_d") > 0L, lit(1)).otherwise(lit(-1)))
    val w = Window.partitionBy(col("key")).orderBy(col("_t"))
    val marked = d.withColumn("_new",
      when(lag(col("_s"), 1).over(w).isNull ||
        lag(col("_s"), 1).over(w) =!= col("_s"), lit(1L)).otherwise(lit(0L)))
    val agg = marked.groupBy(col("key")).agg(
      sum(when(col("_s") === 1, lit(1L)).otherwise(lit(0L))).as("n_pos"),
      sum(when(col("_s") === -1, lit(1L)).otherwise(lit(0L))).as("n_neg"),
      sum(col("_new")).as("n_runs"))
    val n = (col("n_pos") + col("n_neg")).cast("double")
    val a = lit(2.0) * col("n_pos").cast("double") * col("n_neg").cast("double")
    val mu = a / n + lit(1.0)
    val v = a * (a - n) / (n * n * (n - lit(1.0)))
    agg.select(col("key"), col("n_pos"), col("n_neg"), col("n_runs"),
        (round(mu, 6) + lit(0.0)).as("expected_runs"),
        when(col("n_pos") > 0L && col("n_neg") > 0L &&
          (col("n_pos") + col("n_neg")) > 1L && v > 0.0,
          round((col("n_runs").cast("double") - mu) / sqrt(v), 6) + lit(0.0))
          .as("z"))
      .orderBy("key")
  }

  /** Detrended fluctuation analysis (Peng et al. 1994) — the
    * nonstationarity-robust scaling exponent beside [[hurstExponent]]'s
    * aggregated-variance method: integrate the mean-centered series
    * into the profile `Y_t = Σ(v_s − v̄)`, split it into
    * non-overlapping n-point segments, least-squares detrend each, and
    * regress `log F(n)` on `log n` where `F(n)` is the RMS residual —
    * α ≈ 0.5 white noise, > 0.5 persistent, 1.5 Brownian. First-order DFA
    * detrends each profile segment linearly, so level drift that
    * biases R/S and aggregated-variance estimators drops out;
    * disagreement between `alpha` and `hurst` IS the trend
    * diagnostic.
    *
    * Determinism contract (the [[hurstExponent]] three-level scheme):
    *  1. `⌊v·scale⌋` BIGINT images; the INTEGER profile
    *     `Ỹ_t = N·C_t − t·SV` (C the exact cumsum, SV the exact sum)
    *     avoids ever materializing the rational mean;
    *  2. per-segment OLS moments (`ΣỸ`, `Σi·Ỹ`, `ΣỸ²`) are exact
    *     DECIMAL(38) sums; the segment SSE is one fixed double tree
    *     with the index-side constants (`Σi`, segment-OLS denominator)
    *     interpolated as LITERALS (they depend only on n), and
    *     re-quantizes to `round(SSE/N²)` BIGINTs so the cross-segment
    *     reduction is order-free;
    *  3. `F(n)` re-quantizes to a ⌊·10⁶⌋ image in value units so both
    *     engines take `ln` of the same double; the log–log slope then
    *     folds through the same ⌊·10⁹⌋ quantized OLS terms as
    *     [[hurstExponent]].
    * Overflow envelope: `N²·scale·max|v| < 2⁶³` (N buckets per key —
    * at the default 10⁴ scale and |v| ≤ 10³ that is N ≲ 3·10⁵; longer
    * panels should be sharded by era upstream) and segment
    * `ΣỸ² ≤ n·(2N²·scale·max|v|)²` inside DECIMAL(38) — n ≤ 64 at the
    * same bound holds with two digits to spare.
    *
    * Scale shape: one keyed window pass (profile), a |scales|-way
    * skinny replicate, one map-side-combined segment agg onto
    * keys·scales·segments rows, then keys-sized reductions. Gaps in
    * the bucket grid concatenate (the profile runs over PRESENT
    * buckets in order) — the standard practice for unevenly sampled
    * DFA. Returns `(key, n, n_segments, f_n, n_scales, alpha)` with
    * `alpha` repeated per scale row ([[hurstExponent]] shape). */
  def dfa(df: DataFrame, keyCol: String, bucketCol: String,
          valueCol: String, ns: Seq[Int] = Seq(8, 16, 32, 64),
          scale: Double = 1e4): DataFrame = {
    require(ns.nonEmpty && ns.forall(_ >= 4), s"segment sizes must be >= 4, got $ns")
    require(ns.distinct.size == ns.size, s"duplicate segment sizes: $ns")
    val D38 = org.apache.spark.sql.types.DecimalType(38, 0)
    val base = quantizedBase(df, keyCol, bucketCol, valueCol, scale)
    val wk = Window.partitionBy(col("_k")).orderBy(col("_t"))
    val wka = Window.partitionBy(col("_k"))
    val prof = base
      .withColumn("idx", row_number().over(wk).cast("long"))
      .withColumn("_c", sum(col("_v")).over(wk))
      .withColumn("_n", count(lit(1)).over(wka))
      .withColumn("_sv", sum(col("_v")).over(wka))
      .withColumn("_yt", col("_n") * col("_c") - col("idx") * col("_sv"))
    val meta = ns.map { n =>
      val sx = n.toLong * (n - 1) / 2
      val sxx = (n.toLong - 1) * n * (2L * n - 1) / 6
      (n.toLong, sx.toDouble, (n * sxx - sx * sx).toDouble)
    }
    val withN = prof.withColumn("_m", explode(array(meta.map { case (n, sx, den) =>
        struct(lit(n).as("nseg"), lit(sx).as("sxl"), lit(den).as("denl"))
      }: _*)))
      .select(col("_k").as("key"), col("_n"), col("idx"), col("_yt"),
        col("_m.nseg").as("nseg"), col("_m.sxl").as("sxl"),
        col("_m.denl").as("denl"))
      .withColumn("_blk",
        ((col("idx") - lit(1L) - pmod(col("idx") - lit(1L), col("nseg")))
          / col("nseg").cast("double")).cast("long"))
      .withColumn("_i", pmod(col("idx") - lit(1L), col("nseg")))
    val blocks = withN
      .groupBy(col("key"), col("nseg"), col("sxl"), col("denl"), col("_blk"))
      .agg(count(lit(1)).as("_cnt"), max(col("_n")).as("_nn"),
        sum(col("_yt").cast(D38)).as("_sy"),
        sum(col("_i").cast(D38) * col("_yt")).as("_sxy"),
        sum(col("_yt").cast(D38) * col("_yt")).as("_syy"))
      .where(col("_cnt") === col("nseg"))
    val nd = col("nseg").cast("double")
    val b = (nd * col("_sxy").cast("double") -
      col("sxl") * col("_sy").cast("double")) / col("denl")
    val a = (col("_sy").cast("double") - b * col("sxl")) / nd
    val sse = col("_syy").cast("double") - a * col("_sy").cast("double") -
      b * col("_sxy").cast("double")
    val nnD = col("_nn").cast("double")
    val seg = blocks.withColumn("_sseq",
      round(sse / (nnD * nnD)).cast("long"))
    val legs = seg.groupBy(col("key"), col("nseg"))
      .agg(count(lit(1)).as("n_segments"),
        sum(col("_sseq").cast(D38)).as("_ss"))
      .withColumn("_f2",
        col("_ss").cast("double") /
          (col("n_segments").cast("double") * col("nseg").cast("double")))
      .withColumn("_fq", when(col("_f2") > 0.0,
        floor(sqrt(col("_f2")) / lit(scale) * lit(1e6)).cast("long")))
      .where(col("_fq").isNotNull && col("_fq") > 0L)
      .withColumn("f_n", col("_fq").cast("double") / lit(1e6))
    // level-3 quantized log–log OLS (the hurstExponent tail verbatim)
    val lx = log(col("nseg").cast("double"))
    val ly = log(col("f_n"))
    val terms = legs
      .withColumn("_xq", floor(lx * lit(1e9)).cast("long"))
      .withColumn("_yq", floor(ly * lit(1e9)).cast("long"))
      .withColumn("_xyq", floor(lx * ly * lit(1e9)).cast("long"))
      .withColumn("_xxq", floor(lx * lx * lit(1e9)).cast("long"))
    val wkey = Window.partitionBy(col("key"))
    val fit = terms
      .withColumn("_ns", count(lit(1)).over(wkey).cast("double"))
      .withColumn("_sx", sum(col("_xq")).over(wkey).cast("double") / lit(1e9))
      .withColumn("_sy", sum(col("_yq")).over(wkey).cast("double") / lit(1e9))
      .withColumn("_sxy", sum(col("_xyq")).over(wkey).cast("double") / lit(1e9))
      .withColumn("_sxx", sum(col("_xxq")).over(wkey).cast("double") / lit(1e9))
    val den = col("_ns") * col("_sxx") - col("_sx") * col("_sx")
    val slope = (col("_ns") * col("_sxy") - col("_sx") * col("_sy")) / den
    fit.select(col("key"), col("nseg").as("n"), col("n_segments"),
        round(col("f_n"), 6).as("f_n"),
        col("_ns").cast("long").as("n_scales"),
        when(col("_ns") >= 2.0 && den > 0.0,
          round(slope, 6)).as("alpha"))
      .orderBy("key", "n")
  }

  /** `ln 2` as THIS JVM computed it — interpolated into the half-life
    * oracle like [[graft.functions.TaIndicators.ParkinsonConst]], so
    * engine-side constant folding can't drift a ulp. */
  val Ln2Const: Double = math.log(2.0)

  /** AR(1) mean-reversion half-life per series — the discretized
    * Ornstein–Uhlenbeck speed every stat-arb screen ranks by: regress
    * `Δv_t = α + β·v_{t−1} + ε` (the Dickey–Fuller shape), take
    * `φ = 1 + β` as the AR(1) coefficient, and report
    * `half_life = −ln2 / ln φ` buckets when `0 < φ < 1` (null
    * otherwise — a non-stationary or oscillating fit has no half-life).
    * Also emits the β t-statistic (the raw Dickey–Fuller t, against
    * DF — not normal — critical values; reported as a ranking signal).
    *
    * Determinism: values quantize to `⌊v·scale⌋` BIGINTs; the five
    * regression moment sums over (v_{t−1}, Δv) pairs accumulate
    * exactly (order-free); β/φ/t and the half-life derive in one fixed
    * double tree (6 dp) with `ln 2` = [[Ln2Const]]. β, φ, t are
    * scale-invariant; the half-life is in BUCKET units. Pairs need
    * both endpoint buckets present (gaps drop the pair). Null β on a
    * zero-variance lag leg; null t when n < 3 or SSE ≤ 0.
    *
    * Scale shape: one shifted (key, bucket) equi-join + one exact
    * moment agg per key, map-side combined. Returns
    * `(key, n_obs, beta, phi, t_stat, half_life)`. */
  def arHalfLife(df: DataFrame, keyCol: String, bucketCol: String,
                 valueCol: String, scale: Double = 1e6): DataFrame = {
    val base = quantizedBase(df, keyCol, bucketCol, valueCol, scale)
      .withColumn("_t", col("_t").cast("long"))
    val pairs = base.as("x").join(base.as("y"),
        col("y._k") === col("x._k") && col("y._t") === col("x._t") + 1L)
      .select(col("x._k").as("key"), col("x._v").as("_xi"),
        (col("y._v") - col("x._v")).as("_yi"))
    val m = pairs.groupBy(col("key")).agg(
      count(lit(1)).as("n_obs"),
      sum(col("_xi")).as("_sx"), sum(col("_yi")).as("_sy"),
      sum(col("_xi") * col("_yi")).as("_sxy"),
      sum(col("_xi") * col("_xi")).as("_sxx"),
      sum(col("_yi") * col("_yi")).as("_syy"))
    val nD = col("n_obs").cast("double")
    def d(c: Column): Column = c.cast("double")
    val sxx = nD * d(col("_sxx")) - d(col("_sx")) * d(col("_sx"))
    val beta = (nD * d(col("_sxy")) - d(col("_sx")) * d(col("_sy"))) / sxx
    val alpha = (d(col("_sy")) - beta * d(col("_sx"))) / nD
    val phi = lit(1.0) + beta
    // SSE = Σy² − αΣy − βΣxy (exact-int sums, fixed tree)
    val sse = d(col("_syy")) - alpha * d(col("_sy")) - beta * d(col("_sxy"))
    val seB = sqrt((sse / (nD - lit(2.0))) / (sxx / nD))
    m.select(col("key"), col("n_obs"),
        when(sxx > 0.0, round(beta, 6)).as("beta"),
        when(sxx > 0.0, round(phi, 6)).as("phi"),
        when(sxx > 0.0 && col("n_obs") >= 3L && sse > 0.0,
          round(beta / seB, 6)).as("t_stat"),
        when(sxx > 0.0 && phi > 0.0 && phi < 1.0,
          round(lit(-Ln2Const) / log(phi), 6)).as("half_life"))
      .orderBy("key")
  }

  /** MacKinnon (2010, QED wp 1227) 5% asymptotic critical value for
    * the 2-variable Engle–Granger residual DF test with constant —
    * interpolated into the oracle so both engines compare against the
    * identical double. */
  val EgCrit5Pct: Double = -3.3377

  /** Engle–Granger two-step cointegration test per series pair
    * (Engle & Granger 1987, Econometrica 55): step 1 regresses
    * `v_b = α + β·v_a + e` by OLS over buckets where BOTH series are
    * present (dependent = the lexicographically LARGER key — flip by
    * renaming series; the [[correlationMatrix]] key-typing contract),
    * step 2 runs the no-deterministic-terms Dickey–Fuller regression
    * `Δe_t = γ·e_{t−1} + ε` on the residuals and reports
    * `df_stat = γ̂/se(γ̂)` plus the 5% call against [[EgCrit5Pct]]. A
    * strongly negative statistic = the spread mean-reverts = the pair
    * is tradeable — feed [[arHalfLife]] the residual for the exit
    * horizon.
    *
    * Determinism: levels quantize to `⌊v·scale⌋` BIGINTs → exact
    * step-1 moment sums → α/β in one fixed double tree; residuals
    * re-quantize to `⌊e·residScale⌋` BIGINTs (both engines floor the
    * same double), so the step-2 moment sums over (e_{t−1}, Δe) are
    * again exact integers and γ/se/t derive in one fixed tree (6 dp).
    * γ and the t are residScale-invariant. Consecutive-bucket pairs
    * only (gaps drop the increment). Null β on a zero-variance x leg;
    * null df_stat when the DF leg has n < 2, zero lag variance, or
    * SSE ≤ 0.
    *
    * Scale shape: one (bucket) equi-join to pair the series (series
    * count is the small dimension), one exact moment agg per pair, a
    * pair-key join back for the residuals, one shifted (pair, bucket)
    * equi-join for Δe, one final agg — nothing corpus-wide. Returns
    * `(key_a, key_b, n_obs, n_df, alpha, beta, df_stat, coint_5pct)`. */
  def engleGranger(df: DataFrame, keyCol: String, bucketCol: String,
                   valueCol: String, scale: Double = 1e6,
                   residScale: Double = 1e6): DataFrame = {
    require(residScale > 0.0, s"residScale must be positive, got $residScale")
    val base = quantizedBase(df, keyCol, bucketCol, valueCol, scale)
      .withColumn("_t", col("_t").cast("long"))
    val paired = base.as("a").join(base.as("b"),
        col("a._t") === col("b._t") && col("a._k") < col("b._k"))
      .select(col("a._k").as("key_a"), col("b._k").as("key_b"),
        col("a._t").as("_t"), col("a._v").as("_vx"), col("b._v").as("_vy"))
    val m1 = paired.groupBy(col("key_a"), col("key_b")).agg(
      count(lit(1)).as("n_obs"),
      sum(col("_vx")).as("_sx"), sum(col("_vy")).as("_sy"),
      sum(col("_vx") * col("_vy")).as("_sxy"),
      sum(col("_vx") * col("_vx")).as("_sxx"))
    def d(c: Column): Column = c.cast("double")
    val nD = col("n_obs").cast("double")
    val sxxC = nD * d(col("_sxx")) - d(col("_sx")) * d(col("_sx"))
    val coefs = m1
      .withColumn("_beta",
        when(sxxC > 0.0,
          (nD * d(col("_sxy")) - d(col("_sx")) * d(col("_sy"))) / sxxC))
      .withColumn("_alphaq", // intercept in QUANTIZED value units
        (d(col("_sy")) - col("_beta") * d(col("_sx"))) / nD)
    // residuals: e = (vy − α − β·vx)/scale, re-quantized; the tiny
    // pair-level coef frame broadcasts back onto the paired rows
    val resid = paired.join(broadcast(coefs
        .select(col("key_a").as("_ka"), col("key_b").as("_kb"),
          col("_beta").as("_b"), col("_alphaq").as("_aq"))
        // toDF strips the agg subtree's hidden output — without it the
        // paired⋈coefs self-lineage join makes key_a/key_b ambiguous
        // (the Spark 4 hidden-column trap)
        .toDF("_ka", "_kb", "_b", "_aq")),
        col("_ka") === col("key_a") && col("_kb") === col("key_b"))
      .where(col("_b").isNotNull)
      .select(col("key_a"), col("key_b"), col("_t"),
        floor((d(col("_vy")) - col("_aq") - col("_b") * d(col("_vx"))) /
          lit(scale) * lit(residScale)).cast("long").as("_e"))
    val dfPairs = resid.as("r0").join(resid.as("r1"),
        col("r1.key_a") === col("r0.key_a") &&
          col("r1.key_b") === col("r0.key_b") &&
          col("r1._t") === col("r0._t") + 1L)
      .select(col("r0.key_a").as("key_a"), col("r0.key_b").as("key_b"),
        col("r0._e").as("_el"), (col("r1._e") - col("r0._e")).as("_de"))
    val m2 = dfPairs.groupBy(col("key_a"), col("key_b")).agg(
        count(lit(1)).as("n_df"),
        sum(col("_el") * col("_de")).as("_sld"),
        sum(col("_el") * col("_el")).as("_sll"),
        sum(col("_de") * col("_de")).as("_sdd"))
      // same hidden-column strip: m2 descends from coefs, and the final
      // coefs⋈m2 join would otherwise see duplicate lineage names
      .toDF("key_a", "key_b", "n_df", "_sld", "_sll", "_sdd")
    val gamma = d(col("_sld")) / d(col("_sll"))
    val sse2 = d(col("_sdd")) - gamma * d(col("_sld"))
    val seG = sqrt((sse2 / (col("n_df").cast("double") - lit(1.0))) /
      d(col("_sll")))
    val stat = when(col("_sll") > 0L && col("n_df") >= 2L && sse2 > 0.0,
      gamma / seG)
    coefs.join(m2, Seq("key_a", "key_b"), "left")
      .select(col("key_a"), col("key_b"), col("n_obs"),
        coalesce(col("n_df"), lit(0L)).as("n_df"),
        when(col("_beta").isNotNull,
          round(col("_alphaq") / lit(scale), 6)).as("alpha"),
        round(col("_beta"), 6).as("beta"),
        round(stat, 6).as("df_stat"),
        when(stat.isNotNull, stat < lit(EgCrit5Pct)).as("coint_5pct"))
      .orderBy("key_a", "key_b")
  }

  /** Hayashi–Yoshida covariance (2005) for ASYNCHRONOUSLY observed
    * series pairs: `Σᵢⱼ Δaᵢ·Δbⱼ·1[intervals overlap]` over the raw tick
    * intervals — unbiased without any resampling/synchronization, where
    * bucket-aligned covariance ([[correlationMatrix]]'s frame) suffers
    * the Epps effect at fine scales. Increments are differences of the
    * `⌊v·scale⌋`-quantized series (exact integers), so the product sum
    * accumulates exactly and only the final `/scale²` is a double
    * (6 dp). Interval semantics: `(t_{i−1}, t_i]` half-open — touching
    * intervals do NOT overlap (`a.s < b.e ∧ b.s < a.e`).
    *
    * Scale shape — the round-7 band-join doctrine: interval overlap is
    * a range condition, so each interval EXPLODES to the `bucketUs`
    * buckets it touches and the bucket id joins as an EQUI key; a
    * qualifying pair is counted exactly once via the ownership residual
    * `bucket = ⌊max(a.s, b.s)/bucketUs⌋` (the overlap's start bucket,
    * provably inside both intervals' bucket ranges). Explode volume is
    * `span/bucketUs + 1` per interval — pick `bucketUs` at or above the
    * typical inter-tick gap; an interval touching more than
    * `maxBucketsPerInterval` buckets fails loudly (a silent 10⁶-bucket
    * explode would be the quadratic blowup sneaking back in by another
    * name). Series count is the small dimension (the correlation-family
    * contract). Returns `(key_a, key_b, n_overlaps, hy_cov)`. */
  def hayashiYoshida(df: DataFrame, keyCol: String, tsCol: String,
                     valueCol: String, tiebreakCol: String, bucketUs: Long,
                     scale: Double = 100.0,
                     maxBucketsPerInterval: Int = 4096): DataFrame = {
    require(bucketUs > 0L, s"bucketUs must be positive, got $bucketUs")
    require(scale > 0.0, s"scale must be positive, got $scale")
    require(maxBucketsPerInterval >= 1,
      s"maxBucketsPerInterval must be >= 1, got $maxBucketsPerInterval")
    // exact BIGINT floor bucket: strip the positive remainder, then a
    // double divide of the exact multiple (exact below 2⁵³ µs ≈ year
    // 2255 — the documented range of every µs timestamp here)
    def bkt(c: Column): Column =
      ((c - pmod(c, lit(bucketUs))) / lit(bucketUs.toDouble)).cast("long")
    val ivs = df.where(col(valueCol).isNotNull)
      .select(col(keyCol).cast("string").as("_k"),
        unix_micros(col(tsCol).cast("timestamp")).as("_e"),
        floor(col(valueCol).cast("double") * scale).cast("long").as("_vq"),
        col(tiebreakCol).as("_tb0"))
      .select(col("_k"), col("_e"),
        lag(col("_e"), 1).over(
          org.apache.spark.sql.expressions.Window
            .partitionBy(col("_k")).orderBy(col("_e"), col("_tb0"))).as("_s"),
        (col("_vq") - lag(col("_vq"), 1).over(
          org.apache.spark.sql.expressions.Window
            .partitionBy(col("_k")).orderBy(col("_e"), col("_tb0")))).as("_dr"))
      .where(col("_s").isNotNull)
    val spanned = ivs
      .withColumn("_b0", bkt(col("_s")))
      // the guard lives INSIDE the exploded column — a free-standing
      // check column would be pruned away unevaluated (the round-7
      // count() lesson applies to raise_error sentinels too)
      .withColumn("_b1",
        when(bkt(col("_e")) - col("_b0") >= maxBucketsPerInterval,
          raise_error(concat(lit("hayashiYoshida: an interval spans "),
            (bkt(col("_e")) - col("_b0") + 1).cast("string"),
            lit(s" buckets (cap $maxBucketsPerInterval) — raise bucketUs " +
              "toward the inter-tick gap or the explode IS the blowup"))))
          .otherwise(bkt(col("_e"))))
      .withColumn("_bkt", explode(sequence(col("_b0"), col("_b1"))))
      .drop("_b0", "_b1")
    val a = spanned.select(col("_k").as("key_a"), col("_s").as("_sa"),
      col("_e").as("_ea"), col("_dr").as("_dra"), col("_bkt"))
    val b = spanned.select(col("_k").as("key_b"), col("_s").as("_sb"),
      col("_e").as("_eb"), col("_dr").as("_drb"), col("_bkt").as("_bktb"))
    a.join(b,
        col("_bkt") === col("_bktb") && col("key_a") < col("key_b") &&
          col("_sa") < col("_eb") && col("_sb") < col("_ea") &&
          col("_bkt") === bkt(greatest(col("_sa"), col("_sb"))))
      .groupBy("key_a", "key_b")
      .agg(count(lit(1)).as("n_overlaps"),
        sum(col("_dra") * col("_drb")).as("_sp"))
      .select(col("key_a"), col("key_b"), col("n_overlaps"),
        round(col("_sp").cast("double") / lit(scale * scale), 6).as("hy_cov"))
      .orderBy("key_a", "key_b")
  }

  /** Event study — average response of each series around MARKER times
    * (MacKinlay 1997's CAR methodology, the standard "what happens to X
    * in the k buckets after events of type Y" diagnostic): for every
    * marker bucket and offset `o ∈ [−maxOffset, maxOffset]`, collect
    * the series value at `bucket + o`, average per (series, offset),
    * and emit the cumulative sum over offsets (the CAR curve; feed
    * returns to get the classical abnormal-return reading).
    *
    * `markers` is a one-column frame of INTEGRAL bucket indexes (same
    * units as `bucketCol` — exact integer division upstream, the
    * correlation-family contract); duplicates are collapsed. Missing
    * (marker, offset) observations simply don't count toward that
    * offset's n.
    *
    * Determinism: values quantize to `⌊v·scale⌋` BIGINTs; per-offset
    * sums are exact integers; `mean = Σ/n/scale` is one double tree
    * (6 dp) and the CAR accumulates the exact integer sums FIRST
    * (Σ over offsets of per-offset Σ/n is not associative in doubles —
    * so the cumulative is over `⌊Σ/n·10⁶⌉`-quantized means, documented
    * and replayed by the oracle).
    *
    * Scale shape: markers explode ×(2·maxOffset+1) (marker-count ×
    * window rows — the small dimension), one (bucket) equi-join against
    * the skinny series frame, agg onto series×offsets keys, one tiny
    * window for the cumulative. Nothing corpus-wide. Returns
    * `(key, offset, n_obs, mean_v, car)`. */
  def eventStudy(df: DataFrame, keyCol: String, bucketCol: String,
                 valueCol: String, markers: DataFrame, maxOffset: Int,
                 scale: Double = 1e6): DataFrame = {
    require(maxOffset >= 0, s"maxOffset must be >= 0, got $maxOffset")
    val base = quantizedBase(df, keyCol, bucketCol, valueCol, scale)
      .withColumn("_t", col("_t").cast("long"))
    val mk = markers.select(col(markers.columns.head).cast("long").as("_m"))
      .distinct()
      .withColumn("offset",
        explode(sequence(lit(-maxOffset.toLong), lit(maxOffset.toLong))))
    val joined = mk.join(base, col("_t") === col("_m") + col("offset"))
    val agg = joined.groupBy(col("_k").as("key"), col("offset"))
      .agg(count(lit(1)).as("n_obs"), sum(col("_v")).as("_s"))
    val meanRaw = col("_s").cast("double") / col("n_obs").cast("double") /
      lit(scale)
    val wCum = org.apache.spark.sql.expressions.Window
      .partitionBy(col("key")).orderBy(col("offset"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    agg
      .withColumn("_mq", round(meanRaw * 1e6).cast("long"))
      .select(col("key"), col("offset"), col("n_obs"),
        round(meanRaw, 6).as("mean_v"),
        round(sum(col("_mq")).over(wCum).cast("double") / 1e6, 6).as("car"))
      .orderBy("key", "offset")
  }

  /** Purged walk-forward cross-validation splits with embargo (the
    * López de Prado time-series CV protocol): `k` contiguous equal-TIME
    * test folds; for each fold every sample gets a role —
    *  - `test`: observation time inside the fold window;
    *  - `purged`: training candidate whose LABEL interval
    *    `[ts, ts + horizon]` overlaps the test window (its label peeks
    *    at test-period outcomes — the leakage plain K-fold misses);
    *  - `embargo`: starts within `embargo` µs AFTER the test window
    *    (serial correlation leaks backward from test into immediately
    *    following samples);
    *  - `train`: everything else.
    * Plain hash or random K-fold on financial series overstates skill
    * precisely because it skips the purge+embargo; [[Dedup.leakageSafeSplit]]
    * is the content-duplication analog of this temporal control.
    *
    * Fold bounds derive from the corpus min/max observation µs in EXACT
    * integer arithmetic (span divided with `div`, last fold takes the
    * remainder), so membership is engine-reproducible — no float
    * quantiles. Output: one row per sample per fold,
    * `(idCol, ts_us, fold, role)` — n·k rows, k is small.
    *
    * Scale shape: one 2-value global agg (min/max), then a broadcast
    * cross join against the k-row fold frame and a pure projection —
    * the corpus never shuffles or sorts. */
  def purgedTimeSplit(df: DataFrame, idCol: String, tsCol: String,
                      k: Int, horizonUs: Long, embargoUs: Long = 0L): DataFrame = {
    require(k >= 2, s"need k >= 2 folds, got $k")
    require(horizonUs >= 0L && embargoUs >= 0L,
      s"horizon/embargo must be non-negative, got $horizonUs/$embargoUs")
    val e = df.select(col(idCol), unix_micros(col(tsCol).cast("timestamp")).as("ts_us"))
    val bounds = e.agg(min("ts_us").as("lo"), max("ts_us").as("hi"),
      count(when(col("ts_us").isNull, lit(1))).as("n_null")).head()
    // a sample with an unknown observation time could overlap ANY test
    // window — silently training on it is exactly the leakage this
    // operator exists to prevent, so fail loudly instead
    require(bounds.getLong(2) == 0L,
      s"purgedTimeSplit: ${bounds.getLong(2)} rows have a null $tsCol — " +
        "a leakage control cannot place unknown-time samples; drop or " +
        "repair them upstream")
    if (bounds.isNullAt(0))
      return e.withColumn("fold", lit(null).cast("long"))
        .withColumn("role", lit(null).cast("string"))
    val lo = bounds.getLong(0)
    val hi = bounds.getLong(1)
    val span = hi - lo + 1L // inclusive of the last observation
    val step = span / k
    require(step > 0L,
      s"purgedTimeSplit: the corpus spans only $span µs — fewer than k=$k " +
        "folds; earlier folds would be empty and every role bogus")
    val folds = (0 until k).map { f =>
      val a = lo + f * step
      val b = if (f == k - 1) hi + 1L else lo + (f + 1) * step
      (f.toLong, a, b)
    }
    val foldDf = broadcast(df.sparkSession.createDataFrame(
      df.sparkSession.sparkContext.parallelize(folds, 1))
      .toDF("fold", "f_lo", "f_hi"))
    e.crossJoin(foldDf)
      .withColumn("role",
        when(col("ts_us") >= col("f_lo") && col("ts_us") < col("f_hi"), "test")
          .when(col("ts_us") < col("f_lo") &&
            col("ts_us") + lit(horizonUs) >= col("f_lo"), "purged")
          .when(col("ts_us") >= col("f_hi") &&
            col("ts_us") < col("f_hi") + lit(embargoUs), "embargo")
          .otherwise("train"))
      .select(col(idCol), col("ts_us"), col("fold"), col("role"))
  }

  /** The lexicographic test-group combinations of [[cpcvSplit]] with
    * their per-group PATH indices: `(split_id, group, path)` — public
    * so a query's oracle interpolates the IDENTICAL enumeration. Path =
    * the occurrence number of the group across splits (ordered by
    * split id); each group occurs C(k−1, p−1) times, which is exactly
    * López de Prado's φ backtest-path count. */
  def cpcvCombos(k: Int, pTest: Int): Seq[(Long, Long, Long)] = {
    val occ = scala.collection.mutable.Map.empty[Int, Long]
    for {
      (c, sid) <- (0 until k).combinations(pTest).toSeq.zipWithIndex
      g <- c
    } yield {
      val p = occ.getOrElse(g, 0L)
      occ(g) = p + 1
      (sid.toLong, g.toLong, p)
    }
  }

  /** Combinatorial purged cross-validation (López de Prado AFML
    * ch. 12 §12.4): instead of [[purgedTimeSplit]]'s k single-fold test
    * windows, EVERY combination of `pTest` of the k contiguous time
    * groups serves as a test set — C(k, pTest) splits, each with the
    * same purge (label horizon overlapping a test window) and embargo
    * (serially-correlated aftermath) controls applied around EVERY test
    * group of that split. Each group lands in C(k−1, pTest−1) test
    * sets; stitching each group's j-th occurrence into curve j yields
    * that many independent BACKTEST PATHS (`path` column, test rows
    * only) — the variance-of-performance estimate a single walk-forward
    * can't give.
    *
    * Group bounds are [[purgedTimeSplit]]'s exact integer-µs windows
    * (and with `pTest = 1` the roles reduce to purgedTimeSplit's
    * EXACTLY, split ≡ fold — spec-pinned). Output: one row per sample
    * per split, `(idCol, ts_us, split_id, fold, role, path)` —
    * n·C(k, pTest) rows; `fold` is the sample's own time group, `path`
    * null off the test rows.
    *
    * Scale shape: one 2-value global agg, then a broadcast join against
    * the C(k,pTest)·pTest-row split-group frame and one (row, split)
    * aggregation clustered by the row — the corpus never sorts; output
    * fan-out is the C(k,pTest) factor the protocol itself demands
    * (guarded: combinations are driver-enumerated, ≤ 4096). */
  def cpcvSplit(df: DataFrame, idCol: String, tsCol: String,
                k: Int, pTest: Int, horizonUs: Long,
                embargoUs: Long = 0L): DataFrame = {
    require(k >= 2, s"need k >= 2 groups, got $k")
    require(pTest >= 1 && pTest < k, s"need 1 <= pTest < k, got $pTest/$k")
    require(horizonUs >= 0L && embargoUs >= 0L,
      s"horizon/embargo must be non-negative, got $horizonUs/$embargoUs")
    val nSplits = (0 until k).combinations(pTest).size
    require(nSplits <= 4096,
      s"cpcvSplit: C($k, $pTest) = $nSplits splits — the split-group frame " +
        "is driver-enumerated and the output fans out per split; use fewer groups")
    val spark = df.sparkSession
    val e = df.select(col(idCol),
      unix_micros(col(tsCol).cast("timestamp")).as("ts_us"))
    val bounds = e.agg(min("ts_us").as("lo"), max("ts_us").as("hi"),
      count(when(col("ts_us").isNull, lit(1))).as("n_null")).head()
    require(bounds.getLong(2) == 0L,
      s"cpcvSplit: ${bounds.getLong(2)} rows have a null $tsCol — " +
        "a leakage control cannot place unknown-time samples")
    if (bounds.isNullAt(0))
      return e.withColumn("split_id", lit(null).cast("long"))
        .withColumn("fold", lit(null).cast("long"))
        .withColumn("role", lit(null).cast("string"))
        .withColumn("path", lit(null).cast("long"))
    val lo = bounds.getLong(0)
    val hi = bounds.getLong(1)
    val span = hi - lo + 1L
    val step = span / k
    require(step > 0L,
      s"cpcvSplit: the corpus spans only $span µs — fewer than k=$k groups")
    def gLo(g: Long) = lo + g * step
    def gHi(g: Long) = if (g == k - 1) hi + 1L else lo + (g + 1) * step
    val sg = broadcast(spark.createDataFrame(spark.sparkContext.parallelize(
        cpcvCombos(k, pTest).map { case (s, g, p) => (s, g, p, gLo(g), gHi(g)) }, 1))
      .toDF("split_id", "_sg", "path", "_g_lo", "_g_hi"))
    e.withColumn("fold",
        least(lit(k - 1L), expr(s"(ts_us - ${lo}L) div ${step}L")))
      .crossJoin(sg)
      .groupBy(col(idCol), col("ts_us"), col("fold"), col("split_id"))
      .agg(
        max(when(col("fold") === col("_sg"), col("path"))).as("_path"),
        max((col("fold") === col("_sg")).cast("int")).as("_t"),
        max((col("ts_us") < col("_g_lo") &&
          col("ts_us") + lit(horizonUs) >= col("_g_lo")).cast("int")).as("_p"),
        max((col("ts_us") >= col("_g_hi") &&
          col("ts_us") < col("_g_hi") + lit(embargoUs)).cast("int")).as("_e"))
      .select(col(idCol), col("ts_us"), col("split_id"), col("fold"),
        when(col("_t") === 1, "test").when(col("_p") === 1, "purged")
          .when(col("_e") === 1, "embargo").otherwise("train").as("role"),
        when(col("_t") === 1, col("_path")).as("path"))
  }

  /** [[cpcvSplit]]'s assignment FUSED onto the carrying frame (r13
    * optimization round): the group bounds are driver constants, so
    * the per-split role/path logic compiles to literal codegen
    * predicates inside one `explode` of `nSplits` structs — no
    * crossJoin fan-out, no groupBy, and no id-join back onto the
    * carrier (q_cpcv_paths paid two corpus shuffles for exactly that).
    * Emits every carrier column plus `(split_id, fold, role, path)`,
    * row-for-row identical to `df JOIN cpcvSplit(df) ON idCol` modulo
    * the join's column pruning. [[cpcvSplit]] stays the declared
    * split operator; this is the composition seam.
    *
    * Null-`tsCol` rows raise (the cpcvSplit contract); an empty frame
    * returns empty with the extended schema. */
  def cpcvTagged(df: DataFrame, tsCol: String,
                 k: Int, pTest: Int, horizonUs: Long,
                 embargoUs: Long = 0L): DataFrame = {
    require(k >= 2, s"need k >= 2 groups, got $k")
    require(pTest >= 1 && pTest < k, s"need 1 <= pTest < k, got $pTest/$k")
    require(horizonUs >= 0L && embargoUs >= 0L,
      s"horizon/embargo must be non-negative, got $horizonUs/$embargoUs")
    val nSplits = (0 until k).combinations(pTest).size
    require(nSplits <= 4096,
      s"cpcvTagged: C($k, $pTest) = $nSplits splits — the output fans " +
        "out per split; use fewer groups")
    val withTs = df.withColumn("_cp_ts",
      unix_micros(col(tsCol).cast("timestamp")))
    val bounds = withTs.agg(min("_cp_ts").as("lo"), max("_cp_ts").as("hi"),
      count(when(col("_cp_ts").isNull, lit(1))).as("n_null")).head()
    require(bounds.getLong(2) == 0L,
      s"cpcvTagged: ${bounds.getLong(2)} rows have a null $tsCol — " +
        "a leakage control cannot place unknown-time samples")
    if (bounds.isNullAt(0))
      return withTs.drop("_cp_ts")
        .withColumn("split_id", lit(null).cast("long"))
        .withColumn("fold", lit(null).cast("long"))
        .withColumn("role", lit(null).cast("string"))
        .withColumn("path", lit(null).cast("long"))
    val lo = bounds.getLong(0)
    val hi = bounds.getLong(1)
    val span = hi - lo + 1L
    val step = span / k
    require(step > 0L,
      s"cpcvTagged: the corpus spans only $span µs — fewer than k=$k groups")
    def gLo(g: Long) = lo + g * step
    def gHi(g: Long) = if (g == k - 1) hi + 1L else lo + (g + 1) * step
    val ts = col("_cp_ts")
    val fold = least(lit(k - 1L), expr(s"(_cp_ts - ${lo}L) div ${step}L"))
    // one struct per split, every predicate a literal-bound codegen
    // tree — the exact when-precedence of cpcvSplit's aggregate flags
    val perSplit = cpcvCombos(k, pTest).groupBy(_._1).toSeq.sortBy(_._1)
      .map { case (sid, rowsG) =>
        val gs = rowsG.map { case (_, g, p) => (g, p, gLo(g), gHi(g)) }
        val isTest = gs.map { case (g, _, _, _) => fold === lit(g) }
          .reduce(_ || _)
        val pathOf = gs.foldLeft(lit(null).cast("long")) {
          case (acc, (g, p, _, _)) => when(fold === lit(g), lit(p)).otherwise(acc)
        }
        val purged = gs.map { case (_, _, glo, _) =>
          ts < lit(glo) && ts + lit(horizonUs) >= lit(glo) }.reduce(_ || _)
        val embargo = gs.map { case (_, _, _, ghi) =>
          ts >= lit(ghi) && ts < lit(ghi) + lit(embargoUs) }.reduce(_ || _)
        struct(lit(sid).as("split_id"),
          when(isTest, lit("test")).when(purged, lit("purged"))
            .when(embargo, lit("embargo")).otherwise(lit("train")).as("role"),
          when(isTest, pathOf).otherwise(lit(null).cast("long")).as("path"))
      }
    withTs
      .withColumn("fold", fold)
      .withColumn("_cp", explode(array(perSplit: _*)))
      .withColumn("split_id", col("_cp.split_id"))
      .withColumn("role", col("_cp.role"))
      .withColumn("path", col("_cp.path"))
      .drop("_cp", "_cp_ts")
  }

  def saltedJoin(big: DataFrame, small: DataFrame, keys: Seq[String],
                 saltBuckets: Int, joinType: String = "inner"): DataFrame = {
    require(saltBuckets > 0, "saltBuckets must be positive")
    val jt = joinType.toLowerCase.replace("_", "")
    require(!Set("right", "rightouter", "full", "fullouter", "outer").contains(jt),
      s"saltedJoin cannot preserve $joinType semantics: unmatched small-side " +
        "rows would appear once per salt bucket; salt the other side instead")
    val saltedBig = big.withColumn("_salt",
      pmod(xxhash64(big.columns.map(col).toIndexedSeq: _*), lit(saltBuckets.toLong)))
    val replicated = small.withColumn("_salt",
      explode(sequence(lit(0L), lit(saltBuckets - 1L))))
    saltedBig.join(replicated, keys :+ "_salt", joinType).drop("_salt")
  }

  /** Minimum spanning tree of a weighted pair frame via Borůvka rounds
    * (Mantegna 1999's correlation-network backbone when fed
    * `d = √(2(1−ρ))`). `dist` holds the UPPER triangle
    * `(key_a < key_b, distCol)`; weights quantize to ·10⁶ BIGINTs and
    * ties break on `(dq, key_a, key_b)` — a TOTAL order, so the tree
    * is deterministic and any engine replaying the same rounds gets
    * the identical edge set (the fixed-round doctrine: converged
    * components simply stop picking).
    *
    * Per round every component picks its minimum outgoing edge
    * (classic Borůvka — halves the component count, so `rounds` ≥
    * ⌈log₂ n⌉ spans any n-node graph; merged labels propagate by
    * `jumps` min-label steps over the picked component edges, `jumps`
    * ≥ the round's component-chain diameter, n−1 worst case for tiny
    * n). All frames are key- or key²-sized; joins broadcast; lineage
    * truncated per round.
    *
    * `rounds`/`jumps` ≤ 0 (the default) SELF-BUDGET: rounds derive
    * from the node count (⌈log₂ n⌉ — one key-sized count) and label
    * propagation iterates to a FIXPOINT (stop when no label changed,
    * hard-capped at n−1 steps), so no caller-supplied constant can
    * under-merge a component and let a later round re-pick an internal
    * edge as "outgoing" (a cycle edge the cross-round dedup cannot
    * remove). Oracle-replayed call sites that unroll a pinned budget
    * (q_corr_mst: rounds=3, jumps=4 at 5 keys) keep passing explicit
    * values — for them the budget is part of the cross-engine
    * protocol and provably covers their key count.
    *
    * Returns `(key_a, key_b, dist)` — the n−1 tree edges (fewer if
    * the graph is disconnected; null-weight edges are ignored). */
  def minSpanningTree(dist: DataFrame, distCol: String = "dist",
                      rounds: Int = 0, jumps: Int = 0): DataFrame = {
    // derived rounds assume each round FULLY merges its picked
    // components — only the fixpoint propagation guarantees that; a
    // pinned jump budget under auto rounds reintroduces the
    // under-merge hazard the self-budget exists to close
    require(rounds > 0 || jumps <= 0,
      s"minSpanningTree: auto rounds (rounds=$rounds) require fixpoint " +
        s"label propagation — drop the jumps pin (got jumps=$jumps) or pin both")
    // r13 optimization-round restructure (the Backtest.cgRoundLoop
    // rationale — the wall was ~7 checkpoint/broadcast-build/count jobs
    // per Borůvka round, pure driver-loop scheduling floor): every
    // frame here is key-/key²-sized by the solver contract, so state
    // rides the rounds as driver-collected LocalRelations. Broadcasts
    // build driver-side with no job; the picked edges accumulate in a
    // driver buffer and materialize ONCE at the end (the deferred
    // chunk-union rationale); the fixpoint's change test compares the
    // collected label rows instead of running a join+count job. Values
    // are untouched — collect-and-reinject only; every min/least/
    // row_number stays a Spark expression over the same rows.
    val spark = dist.sparkSession
    def localize(df: DataFrame): DataFrame = {
      val rows = df.collect()
      spark.createDataFrame(java.util.Arrays.asList(rows: _*), df.schema)
    }
    val edges = localize(dist
      .select(col("key_a").cast("string").as("a"),
        col("key_b").cast("string").as("b"),
        round(col(distCol) * 1e6).cast("long").as("dq"))
      .where(col("dq").isNotNull && col("a") < col("b"))).coalesce(1)
    var comp = localize(edges.select(col("a").as("node"))
      .unionByName(edges.select(col("b").as("node"))).distinct()
      .withColumn("comp", col("node")))
    val n: Long =
      if (rounds > 0 && jumps > 0) -1L else comp.count()
    val r: Int =
      if (rounds > 0) rounds
      else math.max(1, math.ceil(math.log(math.max(2L, n).toDouble) /
        math.log(2.0)).toInt)
    val mstRows = Seq.newBuilder[org.apache.spark.sql.Row]
    val edgeSchema = edges.schema
    (1 to r).foreach { _ =>
      val oe = edges
        .join(broadcast(comp.select(col("node").as("a"), col("comp").as("ca"))), Seq("a"))
        .join(broadcast(comp.select(col("node").as("b"), col("comp").as("cb"))), Seq("b"))
        .where(col("ca") =!= col("cb"))
      val bi = oe.select(col("ca").as("c"), col("a"), col("b"), col("dq"),
          col("ca"), col("cb"))
        .unionByName(oe.select(col("cb").as("c"), col("a"), col("b"), col("dq"),
          col("ca"), col("cb")))
      val pick = localize(bi
        .coalesce(1) // SinglePartition satisfies the window's clustering
        .withColumn("_rn", row_number().over(
          Window.partitionBy(col("c")).orderBy(col("dq"), col("a"), col("b"))))
        .where(col("_rn") === 1))
      mstRows ++= pick.select(col("a"), col("b"), col("dq")).collect()
      // min-label propagation over the picked component edges
      val ce = localize(pick.select(col("ca").as("x"), col("cb").as("y"))
        .unionByName(pick.select(col("cb").as("x"), col("ca").as("y")))
        .coalesce(1).distinct()).coalesce(1)
      var lab = localize(comp.coalesce(1)
        .select(col("comp").as("l")).distinct()
        .withColumn("lab", col("l")))
      var labRows: Seq[org.apache.spark.sql.Row] = lab.collect().toSeq
      // single-partition shuffle-hash chain: one jump is ONE
      // exchange-free single-task plan layer (the cgRoundLoop pattern)
      def jumpPlan(l0: DataFrame): DataFrame = {
        val nb = ce.join(l0.coalesce(1)
            .select(col("l").as("y"), col("lab").as("nlab"))
            .hint("shuffle_hash"), Seq("y"))
          .coalesce(1)
          .groupBy(col("x")).agg(min(col("nlab")).as("mn"))
        l0.coalesce(1)
          .join(nb.select(col("x").as("l"), col("mn")).hint("shuffle_hash"),
            Seq("l"), "left")
          .select(col("l"), least(col("lab"), coalesce(col("mn"), col("lab"))).as("lab"))
          .coalesce(1)
      }
      def jump(): Boolean = {
        val nextRows = jumpPlan(lab).collect().toSeq
        val prev = labRows.map(r0 => r0.getString(0) -> r0.getString(1)).toMap
        val changed = nextRows.exists(r0 => !prev.get(r0.getString(0)).contains(r0.getString(1)))
        labRows = nextRows
        lab = spark.createDataFrame(java.util.Arrays.asList(nextRows: _*), lab.schema)
        changed
      }
      if (jumps > 0) {
        // pinned budget needs no per-jump change test — chain the
        // `jumps` layers lazily and collect ONCE per round
        val rows = (1 to jumps).foldLeft(lab)((l0, _) => jumpPlan(l0))
          .collect().toSeq
        labRows = rows
        lab = spark.createDataFrame(java.util.Arrays.asList(rows: _*), lab.schema)
      } else {
        // fixpoint: iterate until no label moves. jump() is ONE-HOP
        // min-neighbor propagation (no pointer doubling), so a
        // path-shaped component needs O(diameter) iterations — the
        // n−1 cap is that worst case, not a log bound. Each step is
        // one join over a key-sized LocalRelation, and per-round
        // component graphs are Borůvka-contracted (≤ half the labels
        // survive a round), so diameters stay small in practice; the
        // pinned (rounds, jumps) path shares jump()'s one-hop
        // semantics, which is why the hop rule stays un-doubled here.
        var it = 0L
        var changed = true
        while (changed && it < math.max(1L, n - 1L)) {
          changed = jump()
          it += 1
        }
      }
      comp = localize(comp.coalesce(1)
        .join(lab.coalesce(1).select(col("l").as("comp"), col("lab"))
          .hint("shuffle_hash"), Seq("comp"))
        .select(col("node"), col("lab").as("comp")))
    }
    // dedup ACROSS rounds too: with `jumps` below a merged component's
    // chain diameter, two still-distinct sub-labels of one component can
    // re-pick the edge already joining them in a later round — the edge
    // set must stay a set (and must match an oracle that dedups globally)
    spark.createDataFrame(java.util.Arrays.asList(mstRows.result(): _*),
        edgeSchema)
      .select(col("a").as("key_a"), col("b").as("key_b"),
        (col("dq").cast("double") / lit(1e6)).as("dist"))
      .distinct()
  }

  /** χ²(2) 95% critical value for [[jarqueBera]] — interpolated into
    * the oracle so both engines compare against the identical double. */
  val JbCrit5Pct: Double = 5.991464547107979
  /** χ²(1) 95% critical value, shared by [[archLm]] (exact) and
    * [[granger]] (the F(1, n−3) large-n limit — at the hourly panel's
    * n ≈ 10³ the exact F critical differs in the third decimal; the
    * approximation is DOCUMENTED, not hidden). */
  val Chi2Crit1Df5Pct: Double = 3.841458820694124

  /** Exact first-difference tape of an already-quantized series frame
    * `(_k, _t: long, _v: long)`: one shifted equi-join on (key, bucket)
    * → `(_k, _t, _d)` with `_d = v_t − v_{t−1}` in quantized units.
    * Consecutive buckets only — a gap drops the increment (the
    * [[engleGranger]] step-2 convention). */
  private def diffTape(base: DataFrame): DataFrame =
    base.as("a").join(base.as("b"),
        col("b._k") === col("a._k") && col("b._t") === col("a._t") + 1L)
      .select(col("a._k").as("_k"), (col("a._t") + 1L).as("_t"),
        (col("b._v") - col("a._v")).as("_d"))

  /** Jarque–Bera normality test per series (Jarque & Bera 1980) on the
    * first-difference tape: from exact raw-moment sums of the quantized
    * increments,
    *
    * {{{ S = m₃/m₂^{3/2},  K = m₄/m₂²,  JB = n/6·(S² + (K−3)²/4) }}}
    *
    * with `JB ~ χ²(2)` under normality — the distributional-shape
    * complement of [[runsTest]] (serial order) and the variance-ratio
    * test (scaling): fat tails and asymmetry reject here even when the
    * tape is serially clean. Skew and excess kurtosis are
    * scale-invariant ratios, so the statistic is identical in quantized
    * and value units (no /scale anywhere).
    *
    * Determinism: the four raw power sums `Σd, Σd², Σd³, Σd⁴`
    * accumulate as exact DECIMAL(38,0) (Spark) / HUGEINT (oracle)
    * integers — order-free; central moments, S, K and JB are one fixed
    * double tree from those exact images, rounded 6 dp. Null S/K/JB on
    * zero variance or n < 2.
    *
    * Overflow envelope: `n·(2·scale·max|v|)⁴ < 10³⁸` — at the default
    * 10⁴ scale and |v| ≤ 10³ that is n ≲ 3·10⁸ diffs per key; shard by
    * era far beyond that.
    *
    * Scale shape: one shifted self-join (diffs), one map-side-combined
    * agg onto key rows — nothing corpus-wide. */
  def jarqueBera(df: DataFrame, keyCol: String, bucketCol: String,
                 valueCol: String, scale: Double = 1e4): DataFrame = {
    val base = quantizedBase(df, keyCol, bucketCol, valueCol, scale)
      .withColumn("_t", col("_t").cast("long"))
    val d = diffTape(base)
    val dq = col("_d").cast("decimal(38,0)")
    val agg = d.groupBy(col("_k").as("key")).agg(
      count(lit(1)).as("n"),
      sum(dq).as("_s1"), sum(dq * dq).as("_s2"),
      sum(dq * dq * dq).as("_s3"), sum(dq * dq * dq * dq).as("_s4"))
    def dd(c: Column): Column = c.cast("double")
    val nD = col("n").cast("double")
    val m1 = dd(col("_s1")) / nD
    val m2 = dd(col("_s2")) / nD - m1 * m1
    val m3 = dd(col("_s3")) / nD - lit(3.0) * m1 * dd(col("_s2")) / nD +
      lit(2.0) * m1 * m1 * m1
    val m4 = dd(col("_s4")) / nD - lit(4.0) * m1 * dd(col("_s3")) / nD +
      lit(6.0) * m1 * m1 * dd(col("_s2")) / nD -
      lit(3.0) * m1 * m1 * m1 * m1
    val skew = m3 / sqrt(m2 * m2 * m2)
    val kurt = m4 / (m2 * m2)
    val jb = nD / lit(6.0) *
      (skew * skew + (kurt - lit(3.0)) * (kurt - lit(3.0)) / lit(4.0))
    val ok = col("n") >= 2L && m2 > 0.0
    agg.select(col("key"), col("n"),
        when(ok, round(skew, 6) + lit(0.0)).as("skew"),
        when(ok, round(kurt, 6) + lit(0.0)).as("kurtosis"),
        when(ok, round(jb, 6) + lit(0.0)).as("jb"),
        when(ok, jb > lit(JbCrit5Pct)).as("reject_normal_5pct"))
      .orderBy("key")
  }

  /** Engle's ARCH-LM test per series (Engle 1982, Econometrica 50),
    * q = 1: do squared shocks predict tomorrow's squared shock? Demean
    * the diff tape, regress `e²_t` on `(1, e²_{t−1})`, and report
    * `LM = n·R² ~ χ²(1)` under the no-ARCH null — the volatility-
    * clustering PREREQUISITE check in front of the GARCH filter (a
    * non-rejecting tape gives GARCH nothing to fit). `R²` is invariant
    * under affine maps of each side, so the regression runs directly in
    * quantized units.
    *
    * Determinism — the [[engleGranger]] residual scheme: diffs are
    * exact integers; the mean `Σd/n` is one double; centered residuals
    * re-quantize as `ẽ = ⌊d − μ⌋` (both engines floor the same double),
    * so `ẽ²` is again an exact integer and the five regression moment
    * sums accumulate as DECIMAL(38,0)/HUGEINT — order-free; r², LM and
    * the slope are one fixed double tree, 6 dp. Null on fewer than 3
    * lag pairs or a zero-variance leg.
    *
    * Overflow envelope: `n·(2·scale·max|v|)⁴ < 10³⁸` (the ẽ⁴-class
    * sums) — n ≲ 3·10⁸ diffs per key at the defaults.
    *
    * Scale shape: diffs self-join, the per-key mean via an unordered
    * key window on the already-key-hashed diff frame (no extra
    * exchange), one shifted self-join for the lag pair, one moment
    * agg — all keyed, nothing global. */
  def archLm(df: DataFrame, keyCol: String, bucketCol: String,
             valueCol: String, scale: Double = 1e4): DataFrame = {
    val base = quantizedBase(df, keyCol, bucketCol, valueCol, scale)
      .withColumn("_t", col("_t").cast("long"))
    val d = diffTape(base)
    // per-key mean via an unordered key window — one keyed exchange,
    // no broadcast stage (the diff frame is already key-hashed)
    val wk = Window.partitionBy(col("_k"))
    val e = d
      .withColumn("_n0", count(lit(1)).over(wk))
      .withColumn("_mu",
        sum(col("_d").cast("decimal(38,0)")).over(wk).cast("double") /
          col("_n0").cast("double"))
      .select(col("_k"), col("_t"), col("_n0"),
        floor(col("_d").cast("double") - col("_mu")).cast("long").as("_e"))
      .withColumn("_y", col("_e") * col("_e"))
    val pairs = e.as("p").join(e.as("c"),
        col("c._k") === col("p._k") && col("c._t") === col("p._t") + 1L)
      .select(col("p._k").as("key"), col("p._n0").as("_n0"),
        col("p._y").cast("decimal(38,0)").as("_x"),
        col("c._y").cast("decimal(38,0)").as("_y"))
    val agg = pairs.groupBy(col("key")).agg(
      min(col("_n0")).as("n"), count(lit(1)).as("n_lag"),
      sum(col("_x")).as("_sx"), sum(col("_y")).as("_sy"),
      sum(col("_x") * col("_y")).as("_sxy"),
      sum(col("_x") * col("_x")).as("_sxx"),
      sum(col("_y") * col("_y")).as("_syy"))
    def dd(c: Column): Column = c.cast("double")
    val nD = col("n_lag").cast("double")
    val cov = nD * dd(col("_sxy")) - dd(col("_sx")) * dd(col("_sy"))
    val vx = nD * dd(col("_sxx")) - dd(col("_sx")) * dd(col("_sx"))
    val vy = nD * dd(col("_syy")) - dd(col("_sy")) * dd(col("_sy"))
    val r2 = (cov / (sqrt(vx) * sqrt(vy))) * (cov / (sqrt(vx) * sqrt(vy)))
    val lm = nD * r2
    val ok = col("n_lag") >= 3L && vx > 0.0 && vy > 0.0
    agg.select(col("key"), col("n"), col("n_lag"),
        when(ok, round(cov / vx, 6) + lit(0.0)).as("arch_slope"),
        when(ok, round(lm, 6) + lit(0.0)).as("lm_stat"),
        when(ok, lm > lit(Chi2Crit1Df5Pct)).as("arch_5pct"))
      .orderBy("key")
  }

  /** Bivariate Granger causality (Granger 1969, Econometrica 37) at
    * lag order p = 1, every ORDERED series pair (x → y): does x's last
    * move improve the one-step forecast of y beyond y's own history?
    * Unrestricted `y_t = a + b·y_{t−1} + c·x_{t−1} + u` vs restricted
    * `y_t = a′ + b′·y_{t−1}`, both by closed-form OLS on exact moment
    * sums (the [[graft.functions.TaIndicators.harRegression]] normal-
    * equations doctrine — Cramer's rule, never an iterative solver);
    *
    * {{{ F = (RSS_r − RSS_u)·(n − 3)/RSS_u ~ F(1, n−3) }}}
    *
    * reported with the large-n χ²(1) 95% call ([[Chi2Crit1Df5Pct]] —
    * see the constant's caveat). Directional, unlike [[leadLagCorr]]'s
    * symmetric cross-correlation peaks: x→y and y→x are separate rows,
    * and the pair of F's distinguishes feedback from one-way leads.
    * Runs on the first-difference tape (returns), the stationary frame
    * Granger regressions assume.
    *
    * Determinism: diffs are exact integers; the ten regression moment
    * sums accumulate as DECIMAL(38,0)/HUGEINT — order-free; both OLS
    * solves and the F are one fixed double tree from those images,
    * 6 dp. Null when the 3×3 normal determinant vanishes, RSS_u ≤ 0,
    * or n < 4.
    *
    * Overflow envelope: `n·(2·scale·max|v|)² < 10³⁸` — vacuous at any
    * realistic panel (the products are only quadratic here).
    *
    * Scale shape: one shifted three-way equi-join on (bucket) — series
    * count is the small dimension (the correlation-family contract) —
    * then one map-side-combined moment agg onto ordered-pair rows. */
  def granger(df: DataFrame, keyCol: String, bucketCol: String,
              valueCol: String, scale: Double = 1e4): DataFrame = {
    val base = quantizedBase(df, keyCol, bucketCol, valueCol, scale)
      .withColumn("_t", col("_t").cast("long"))
    val d = diffTape(base)
    val triple = d.as("c").join(d.as("yl"),
        col("yl._k") === col("c._k") && col("yl._t") === col("c._t") - 1L)
      .join(d.as("xl"),
        col("xl._t") === col("c._t") - 1L && col("xl._k") =!= col("c._k"))
      .select(col("xl._k").as("key_cause"), col("c._k").as("key_effect"),
        col("c._d").cast("decimal(38,0)").as("_y"),
        col("yl._d").cast("decimal(38,0)").as("_yl"),
        col("xl._d").cast("decimal(38,0)").as("_xl"))
    val m = triple.groupBy(col("key_cause"), col("key_effect")).agg(
      count(lit(1)).as("n"),
      sum(col("_y")).as("_sy"), sum(col("_yl")).as("_syl"),
      sum(col("_xl")).as("_sxl"),
      sum(col("_y") * col("_y")).as("_syy"),
      sum(col("_y") * col("_yl")).as("_syyl"),
      sum(col("_y") * col("_xl")).as("_syxl"),
      sum(col("_yl") * col("_yl")).as("_sylyl"),
      sum(col("_xl") * col("_xl")).as("_sxlxl"),
      sum(col("_yl") * col("_xl")).as("_sylxl"))
    def dd(c: Column): Column = c.cast("double")
    val nD = col("n").cast("double")
    val (sy, syl, sxl) = (dd(col("_sy")), dd(col("_syl")), dd(col("_sxl")))
    val (syy, syyl, syxl) = (dd(col("_syy")), dd(col("_syyl")), dd(col("_syxl")))
    val (sylyl, sxlxl, sylxl) = (dd(col("_sylyl")), dd(col("_sxlxl")), dd(col("_sylxl")))
    // unrestricted 3×3 normal equations, Cramer's rule
    val det = nD * (sylyl * sxlxl - sylxl * sylxl) -
      syl * (syl * sxlxl - sylxl * sxl) + sxl * (syl * sylxl - sylyl * sxl)
    val detA = sy * (sylyl * sxlxl - sylxl * sylxl) -
      syl * (syyl * sxlxl - sylxl * syxl) + sxl * (syyl * sylxl - sylyl * syxl)
    val detB = nD * (syyl * sxlxl - sylxl * syxl) -
      sy * (syl * sxlxl - sylxl * sxl) + sxl * (syl * syxl - syyl * sxl)
    val detC = nD * (sylyl * syxl - syyl * sylxl) -
      syl * (syl * syxl - syyl * sxl) + sy * (syl * sylxl - sylyl * sxl)
    val (ua, ub, uc) = (detA / det, detB / det, detC / det)
    val rssU = syy - ua * sy - ub * syyl - uc * syxl
    // restricted 2×2
    val denR = nD * sylyl - syl * syl
    val rb = (nD * syyl - syl * sy) / denR
    val ra = (sy - rb * syl) / nD
    val rssR = syy - ra * sy - rb * syyl
    val f = (rssR - rssU) * (nD - lit(3.0)) / rssU
    val ok = col("n") >= 4L && det =!= 0.0 && denR > 0.0 && rssU > 0.0
    m.select(col("key_cause"), col("key_effect"), col("n"),
        when(ok, round(ub, 6) + lit(0.0)).as("beta_ar"),
        when(ok, round(uc, 6) + lit(0.0)).as("beta_cross"),
        when(ok, round(f, 6) + lit(0.0)).as("f_stat"),
        when(ok, f > lit(Chi2Crit1Df5Pct)).as("granger_5pct"))
      .orderBy("key_cause", "key_effect")
  }

  /** Kolmogorov–Smirnov 95% coefficient `c(α) = √(−ln(α/2)/2)` —
    * computed once here and interpolated into the oracle as a literal
    * so both engines compare against the identical double. */
  val KsCrit5Pct: Double = math.sqrt(-math.log(0.025) / 2.0)
  /** Standard-normal 97.5% quantile (two-sided 5% tests). */
  val Z975: Double = 1.959963984540054

  /** Two-sample Kolmogorov–Smirnov drift test per series: split each
    * key's observation window at its integer midpoint bucket and ask
    * whether the value DISTRIBUTION of the second half drifted from the
    * first — `D = sup_v |F̂₁(v) − F̂₂(v)|` with the large-sample 5% call
    * `D > c(α)·√((n₁+n₂)/(n₁·n₂))`. The distribution-level drift check
    * beside the binned PSI monitor (q_psi_drift): KS needs no bin
    * choice and is sensitive anywhere on the CDF, PSI localizes WHICH
    * region moved.
    *
    * Determinism: the statistic is computed as the EXACT INTEGER
    * `max |n₂·C₁(v) − n₁·C₂(v)|` over distinct quantized values (C the
    * cumulative counts — RANGE-frame windows make ties well-defined),
    * divided by `n₁·n₂` only at the very end; the critical-value tree
    * is fixed from interpolated literals. 6 dp. Null D when either
    * half is empty.
    *
    * Scale shape: one keyed window for the split point, one
    * (key, value) count agg, one ordered keyed window for the CDFs,
    * one map-side-combined max — never a pairwise join. */
  /** Shared half-split ECDF frame for the two-sample distribution
    * tests ([[ksTwoSample]] / [[cvmTwoSample]]): label each key's
    * buckets first/second half at the integer midpoint, count per
    * distinct quantized value, and carry the cumulative counts `_f1`/
    * `_f2` plus the half totals `_n1`/`_n2` — all exact integers. */
  private def halfSplitCdf(base: DataFrame): DataFrame = {
    val wk = Window.partitionBy(col("_k"))
    val lab = base
      .withColumn("_mid", expr("(min(_t) over (partition by _k) + " +
        "max(_t) over (partition by _k)) div 2"))
      .withColumn("_h1", col("_t") <= col("_mid"))
    val cnt = lab.groupBy(col("_k"), col("_v")).agg(
      sum(when(col("_h1"), lit(1L)).otherwise(lit(0L))).as("_c1"),
      sum(when(!col("_h1"), lit(1L)).otherwise(lit(0L))).as("_c2"))
    val wkv = Window.partitionBy(col("_k")).orderBy(col("_v"))
    cnt
      .withColumn("_f1", sum(col("_c1")).over(wkv))
      .withColumn("_f2", sum(col("_c2")).over(wkv))
      .withColumn("_n1", sum(col("_c1")).over(wk))
      .withColumn("_n2", sum(col("_c2")).over(wk))
  }

  def ksTwoSample(df: DataFrame, keyCol: String, bucketCol: String,
                  valueCol: String, scale: Double = 1e4): DataFrame = {
    val base = quantizedBase(df, keyCol, bucketCol, valueCol, scale)
      .withColumn("_t", col("_t").cast("long"))
    val cum = halfSplitCdf(base)
    val agg = cum.groupBy(col("_k").as("key")).agg(
      min(col("_n1")).as("n1"), min(col("_n2")).as("n2"),
      max(abs(col("_n2") * col("_f1") - col("_n1") * col("_f2"))).as("_dn"))
    val n1D = col("n1").cast("double")
    val n2D = col("n2").cast("double")
    val dStat = col("_dn").cast("double") / (n1D * n2D)
    val crit = lit(KsCrit5Pct) * sqrt((n1D + n2D) / (n1D * n2D))
    val ok = col("n1") > 0L && col("n2") > 0L
    agg.select(col("key"), col("n1"), col("n2"),
        when(ok, round(dStat, 6) + lit(0.0)).as("d_stat"),
        when(ok, dStat > crit).as("drift_5pct"))
      .orderBy("key")
  }

  /** Asymptotic 5% critical point of the two-sample Cramér–von Mises
    * ω² limit (Anderson & Darling 1952 table) — interpolated into the
    * oracle; the finite-sample critical value differs in the second
    * decimal below n ≈ 20, DOCUMENTED, not hidden. */
  val CvmCrit5Pct: Double = 0.46136

  /** Two-sample Cramér–von Mises drift test per series on the same
    * half-split frame as [[ksTwoSample]] — the INTEGRATED-squared ECDF
    * distance: where KS only sees the single worst point,
    *
    * {{{ T = n·m/N² · Σ_pooled (F̂₁(x) − F̂₂(x))² }}}
    *
    * accumulates every departure, so many small CDF shifts that never
    * produce one large gap still reject here.
    *
    * Determinism: with counts at distinct values, `T = Σ w·(m·C₁ −
    * n·C₂)² / (N²·n·m)` and the numerator sum accumulates as exact
    * DECIMAL(38,0)/HUGEINT integers — order-free; one division at the
    * end, 6 dp. Null when either half is empty.
    *
    * Overflow envelope: `N·(n·m)² < 10³⁸` — N ≲ 10⁹ buckets per key.
    *
    * Scale shape: identical to [[ksTwoSample]] — windows and one agg,
    * never a pairwise join. */
  def cvmTwoSample(df: DataFrame, keyCol: String, bucketCol: String,
                   valueCol: String, scale: Double = 1e4): DataFrame = {
    val base = quantizedBase(df, keyCol, bucketCol, valueCol, scale)
      .withColumn("_t", col("_t").cast("long"))
    val cum = halfSplitCdf(base)
    val diff = col("_n2") * col("_f1") - col("_n1") * col("_f2")
    val wTerm = ((col("_c1") + col("_c2")).cast("decimal(38,0)") *
      diff.cast("decimal(38,0)") * diff.cast("decimal(38,0)"))
    val agg = cum.groupBy(col("_k").as("key")).agg(
      min(col("_n1")).as("n1"), min(col("_n2")).as("n2"),
      sum(wTerm).as("_num"))
    val n1D = col("n1").cast("double")
    val n2D = col("n2").cast("double")
    val nD = n1D + n2D
    val tStat = col("_num").cast("double") / (nD * nD * (n1D * n2D))
    val ok = col("n1") > 0L && col("n2") > 0L
    agg.select(col("key"), col("n1"), col("n2"),
        when(ok, round(tStat, 6) + lit(0.0)).as("t_stat"),
        when(ok, tStat > lit(CvmCrit5Pct)).as("drift_5pct"))
      .orderBy("key")
  }

  /** Chow (1960, Econometrica 28) structural-break F-test at each
    * key's midpoint bucket on the linear-trend model `v = a + b·t`:
    * fit the two halves separately and pooled, and test whether the
    * coefficient pair broke,
    *
    * {{{ F = [(RSS_p − RSS₁ − RSS₂)/2] / [(RSS₁+RSS₂)/(n−4)] ~ F(2, n−4) }}}
    *
    * reported with the large-n χ²(2)/2 5% call (the [[granger]]
    * convention — exact F critical differs in the second decimal at
    * n ≈ 10²). The parametric break test beside the nonparametric
    * [[ksTwoSample]] half-split drift pair: KS sees DISTRIBUTION
    * change, Chow sees TREND-LINE change with dates kept in play.
    *
    * Determinism: buckets re-index per key as `t − min(t)` (floor
    * commutes with the integer shift, so the midpoint matches the
    * [[halfSplitCdf]] convention); all twelve segment moment sums are
    * exact DECIMAL(38,0)/HUGEINT integers in ONE conditional-sum agg
    * (pooled moments are their exact sums); both segment solves, the
    * pooled solve, the three RSS and F are one fixed double tree
    * (RSS scales by scale² — F is invariant), 6 dp. Null on a
    * degenerate segment (n < 3 or zero time-variance) or RSS₁+RSS₂ ≤ 0.
    *
    * Scale shape: one keyed window (re-index + midpoint), one
    * map-side-combined conditional-moment agg onto key rows. */
  def chowTest(df: DataFrame, keyCol: String, bucketCol: String,
               valueCol: String, scale: Double = 1e4): DataFrame = {
    val base = quantizedBase(df, keyCol, bucketCol, valueCol, scale)
      .withColumn("_t", col("_t").cast("long"))
    val seg = base
      .withColumn("_ti", col("_t") - min(col("_t")).over(Window.partitionBy(col("_k"))))
      .withColumn("_mx", max(col("_ti")).over(Window.partitionBy(col("_k"))))
      .withColumn("_s1", col("_ti") <= expr("_mx div 2"))
    def d38(c: Column): Column = c.cast("decimal(38,0)")
    def mom(cond: Column, suffix: String): Seq[Column] = Seq(
      sum(when(cond, lit(1L)).otherwise(lit(0L))).as(s"_n$suffix"),
      sum(when(cond, d38(col("_ti"))).otherwise(d38(lit(0L)))).as(s"_st$suffix"),
      sum(when(cond, d38(col("_ti")) * d38(col("_ti")))
        .otherwise(d38(lit(0L)))).as(s"_stt$suffix"),
      sum(when(cond, d38(col("_v"))).otherwise(d38(lit(0L)))).as(s"_sv$suffix"),
      sum(when(cond, d38(col("_v")) * d38(col("_v")))
        .otherwise(d38(lit(0L)))).as(s"_svv$suffix"),
      sum(when(cond, d38(col("_ti")) * d38(col("_v")))
        .otherwise(d38(lit(0L)))).as(s"_stv$suffix"))
    val moms = mom(col("_s1"), "1") ++ mom(!col("_s1"), "2")
    val agg = seg.groupBy(col("_k").as("key")).agg(moms.head, moms.tail: _*)
    def dd(c: Column): Column = c.cast("double")
    // per-segment closed-form OLS → (slope, rss); pooled moments are
    // the exact integer sums of the two segments'
    def fit(n: Column, st: Column, stt: Column, sv: Column, svv: Column,
            stv: Column): (Column, Column, Column) = {
      val nD = n.cast("double")
      val den = nD * dd(stt) - dd(st) * dd(st)
      val b = (nD * dd(stv) - dd(st) * dd(sv)) / den
      val a = (dd(sv) - b * dd(st)) / nD
      val rss = dd(svv) - a * dd(sv) - b * dd(stv)
      (b, rss, den)
    }
    val (b1, rss1, den1) = fit(col("_n1"), col("_st1"), col("_stt1"),
      col("_sv1"), col("_svv1"), col("_stv1"))
    val (b2, rss2, den2) = fit(col("_n2"), col("_st2"), col("_stt2"),
      col("_sv2"), col("_svv2"), col("_stv2"))
    val (bp, rssP, denP) = fit(col("_n1") + col("_n2"),
      col("_st1") + col("_st2"), col("_stt1") + col("_stt2"),
      col("_sv1") + col("_sv2"), col("_svv1") + col("_svv2"),
      col("_stv1") + col("_stv2"))
    val nTot = (col("_n1") + col("_n2")).cast("double")
    val rssSum = rss1 + rss2
    val f = (rssP - rssSum) / lit(2.0) / (rssSum / (nTot - lit(4.0)))
    val ok = col("_n1") >= 3L && col("_n2") >= 3L && den1 > 0.0 &&
      den2 > 0.0 && denP > 0.0 && rssSum > 0.0
    agg.select(col("key"), col("_n1").as("n1"), col("_n2").as("n2"),
        when(ok, round(b1 / lit(scale), 6) + lit(0.0)).as("slope1"),
        when(ok, round(b2 / lit(scale), 6) + lit(0.0)).as("slope2"),
        when(ok, round(f, 6) + lit(0.0)).as("f_stat"),
        when(ok, f > lit(JbCrit5Pct / 2.0)).as("break_5pct"))
      .orderBy("key")
  }

  /** Transfer entropy (Schreiber 2000, PRL 85) on the BINARY up/down
    * tape, order 1, every ORDERED series pair (x → y):
    *
    * {{{ TE(x→y) = Σ p(y_t, y_{t−1}, x_{t−1})
    *                 · ln [ p(y_t | y_{t−1}, x_{t−1}) / p(y_t | y_{t−1}) ] }}}
    *
    * — the model-free, nonlinearity-robust companion of [[granger]]:
    * Granger's F only sees LINEAR one-step predictability; TE detects
    * any information flow the 8-cell sign-transition histogram can
    * express. Plug-in estimate over the joint counts; as a conditional
    * mutual information of the empirical distribution it is ≥ 0 up to
    * the term quantization below. Signs binarize as `1[d > 0]` (flat
    * and down collapse — the 2-symbol alphabet keeps every cell
    * populated on realistic tapes; callers wanting a 3-symbol tape
    * should pre-filter zero diffs upstream).
    *
    * Determinism — the unigram-LM µnat scheme: all cell and marginal
    * counts are exact integers (windows over the ≤8-row-per-pair cell
    * frame); each cell's term `c/n · ln(c·c_yl / (c_ylxl·c_yyl))` is
    * one fixed double tree and re-quantizes to a ⌊·10⁹⌋ µnat BIGINT so
    * the cross-cell reduction is order-free; `/10⁹` and 6 dp at the
    * end.
    *
    * Scale shape: the [[granger]] triple join (series count is the
    * small dimension), an 8-cell-per-pair count agg, window marginals
    * on that tiny frame, one final agg. */
  def transferEntropy(df: DataFrame, keyCol: String, bucketCol: String,
                      valueCol: String, scale: Double = 1e4): DataFrame = {
    val base = quantizedBase(df, keyCol, bucketCol, valueCol, scale)
      .withColumn("_t", col("_t").cast("long"))
    val sgn = diffTape(base)
      .withColumn("_s", when(col("_d") > 0L, lit(1)).otherwise(lit(0)))
    val tr = sgn.as("c").join(sgn.as("yl"),
        col("yl._k") === col("c._k") && col("yl._t") === col("c._t") - 1L)
      .join(sgn.as("xl"),
        col("xl._t") === col("c._t") - 1L && col("xl._k") =!= col("c._k"))
      .select(col("xl._k").as("key_cause"), col("c._k").as("key_effect"),
        col("c._s").as("_y"), col("yl._s").as("_yl"), col("xl._s").as("_xl"))
    val cells = tr.groupBy(col("key_cause"), col("key_effect"),
        col("_y"), col("_yl"), col("_xl"))
      .agg(count(lit(1)).as("_c"))
    val pw = Window.partitionBy(col("key_cause"), col("key_effect"))
    val wYlXl = Window.partitionBy(col("key_cause"), col("key_effect"),
      col("_yl"), col("_xl"))
    val wYYl = Window.partitionBy(col("key_cause"), col("key_effect"),
      col("_y"), col("_yl"))
    val wYl = Window.partitionBy(col("key_cause"), col("key_effect"),
      col("_yl"))
    val withMarg = cells
      .withColumn("_n", sum(col("_c")).over(pw))
      .withColumn("_cylxl", sum(col("_c")).over(wYlXl))
      .withColumn("_cyyl", sum(col("_c")).over(wYYl))
      .withColumn("_cyl", sum(col("_c")).over(wYl))
    def dd(c: Column): Column = c.cast("double")
    val term = dd(col("_c")) / dd(col("_n")) *
      log(dd(col("_c")) * dd(col("_cyl")) /
        (dd(col("_cylxl")) * dd(col("_cyyl"))))
    val agg = withMarg
      .withColumn("_tq", floor(term * lit(1e9)).cast("long"))
      .groupBy(col("key_cause"), col("key_effect"))
      .agg(min(col("_n")).as("n"), sum(col("_tq")).as("_sq"))
    agg.select(col("key_cause"), col("key_effect"), col("n"),
        (round(col("_sq").cast("double") / lit(1e9), 6) + lit(0.0))
          .as("te_nats"))
      .orderBy("key_cause", "key_effect")
  }

  /** First-order partial correlation for every pair GIVEN each other
    * series as the control:
    *
    * {{{ r_xy·z = (r_xy − r_xz·r_yz) / √(1−r_xz²)·√(1−r_yz²) }}}
    *
    * — the spurious-correlation screen on top of
    * [[correlationMatrix]]: a pair whose raw r is large but whose
    * partials all collapse toward 0 is co-moving through the controls
    * (the market factor), not with each other; the pairwise complement
    * of q_detoned_corr's global factor removal.
    *
    * Determinism: derives from the 6-dp-ROUNDED pair images the
    * hash-gated [[correlationMatrix]] already emits (both engines
    * compose identical doubles — determinism-first by construction);
    * one fixed tree per triple, 6 dp. Null when either control pair is
    * null/degenerate (|r| = 1) or never co-observed (the triple drops
    * with its missing leg).
    *
    * Scale shape: the pair frame is keys²-sized (the correlation-
    * family small-dimension contract); the triple expansion joins
    * broadcast key-sized frames — the corpus is touched only by the
    * underlying [[correlationMatrix]] pass. */
  def partialCorrelation(df: DataFrame, keyCol: String, bucketCol: String,
                         valueCol: String, scale: Double = 1e4): DataFrame = {
    val cm = correlationMatrix(df, keyCol, bucketCol, valueCol, scale)
      .select(col("key_a"), col("key_b"), col("corr"))
    val sym = cm.unionByName(cm.select(col("key_b").as("key_a"),
      col("key_a").as("key_b"), col("corr")))
    val keys = sym.select(col("key_a").as("kk")).distinct()
    val tri = cm.join(broadcast(keys),
      col("kk") =!= col("key_a") && col("kk") =!= col("key_b"))
    val withCtrl = tri
      .join(broadcast(sym.select(col("key_a").as("_xa"), col("key_b").as("_xz"),
          col("corr").as("_raz"))),
        col("_xa") === col("key_a") && col("_xz") === col("kk"))
      .join(broadcast(sym.select(col("key_a").as("_ya"), col("key_b").as("_yz"),
          col("corr").as("_rbz"))),
        col("_ya") === col("key_b") && col("_yz") === col("kk"))
    val da = lit(1.0) - col("_raz") * col("_raz")
    val db = lit(1.0) - col("_rbz") * col("_rbz")
    val partial = (col("corr") - col("_raz") * col("_rbz")) /
      (sqrt(da) * sqrt(db))
    val ok = col("corr").isNotNull && col("_raz").isNotNull &&
      col("_rbz").isNotNull && da > 0.0 && db > 0.0
    withCtrl.select(col("key_a"), col("key_b"), col("kk").as("key_ctrl"),
        col("corr").as("corr_raw"),
        when(ok, round(partial, 6) + lit(0.0)).as("partial_corr"))
      .orderBy("key_a", "key_b", "key_ctrl")
  }

  /** Lag-0 mutual information on the binary up/down tape, every
    * UNORDERED series pair — the symmetric companion of
    * [[transferEntropy]] (TE asks "does x's PAST inform y's future?",
    * MI asks "do the two tapes co-move AT ALL?"; MI ≫ 0 with both TEs
    * ≈ 0 is the common-driver signature):
    *
    * {{{ MI = Σ_{a,b} p(a,b) · ln[ p(a,b) / (p(a)·p(b)) ] }}}
    *
    * over the 4-cell contemporaneous sign histogram. Plug-in estimate;
    * ≥ 0 up to the term quantization.
    *
    * Determinism — the [[transferEntropy]] µnat scheme: exact integer
    * cell/marginal counts, each term `c/n · ln(c·n/(c_a·c_b))` is one
    * fixed tree re-quantized to a ⌊·10⁹⌋ BIGINT, order-free reduction,
    * 6 dp.
    *
    * Scale shape: one bucket equi-join to pair the tapes (series count
    * is the small dimension), a 4-cell-per-pair count agg, window
    * marginals on that tiny frame, one final agg. */
  def mutualInfo(df: DataFrame, keyCol: String, bucketCol: String,
                 valueCol: String, scale: Double = 1e4): DataFrame = {
    val base = quantizedBase(df, keyCol, bucketCol, valueCol, scale)
      .withColumn("_t", col("_t").cast("long"))
    val sgn = diffTape(base)
      .withColumn("_s", when(col("_d") > 0L, lit(1)).otherwise(lit(0)))
    val paired = sgn.as("a").join(sgn.as("b"),
        col("b._t") === col("a._t") && col("a._k") < col("b._k"))
      .select(col("a._k").as("key_a"), col("b._k").as("key_b"),
        col("a._s").as("_sa"), col("b._s").as("_sb"))
    val cells = paired.groupBy(col("key_a"), col("key_b"),
        col("_sa"), col("_sb"))
      .agg(count(lit(1)).as("_c"))
    val pw = Window.partitionBy(col("key_a"), col("key_b"))
    val wA = Window.partitionBy(col("key_a"), col("key_b"), col("_sa"))
    val wB = Window.partitionBy(col("key_a"), col("key_b"), col("_sb"))
    val withMarg = cells
      .withColumn("_n", sum(col("_c")).over(pw))
      .withColumn("_ca", sum(col("_c")).over(wA))
      .withColumn("_cb", sum(col("_c")).over(wB))
    def dd(c: Column): Column = c.cast("double")
    val term = dd(col("_c")) / dd(col("_n")) *
      log(dd(col("_c")) * dd(col("_n")) / (dd(col("_ca")) * dd(col("_cb"))))
    val agg = withMarg
      .withColumn("_tq", floor(term * lit(1e9)).cast("long"))
      .groupBy(col("key_a"), col("key_b"))
      .agg(min(col("_n")).as("n"), sum(col("_tq")).as("_sq"))
    agg.select(col("key_a"), col("key_b"), col("n"),
        (round(col("_sq").cast("double") / lit(1e9), 6) + lit(0.0))
          .as("mi_nats"))
      .orderBy("key_a", "key_b")
  }

  /** Gini concentration of an exact-cent measure over members of a
    * group (volume by user, tokens by source — "how unequal is the
    * contribution distribution?"): with member totals sorted ascending,
    *
    * {{{ G = 2·Σ i·x_(i) / (n·Σx) − (n+1)/n }}}
    *
    * 0 = perfectly even, → 1 = one member carries everything. The
    * inequality gauge beside the share-quota samplers (a corpus whose
    * G → 1 is one source in a trench coat).
    *
    * Determinism: member totals are exact DECIMAL(18,2) sums emitted
    * as integer CENTS; rank weights make `Σ i·x` TIE-INVARIANT (equal
    * totals swap equal values between ranks), so the weighted sum
    * accumulates as DECIMAL(38,0)/HUGEINT exactly; G is one fixed
    * tree, 6 dp. Null on an empty group or Σx ≤ 0.
    *
    * Scale shape: one (group, member) agg, one ordered keyed window
    * for ranks, one map-side-combined agg onto group rows. */
  def gini(df: DataFrame, groupCols: Seq[String], memberCol: String,
           valueCol: String): DataFrame = {
    require(groupCols.nonEmpty, "gini needs the group key(s)")
    val cents = df.where(col(valueCol).isNotNull)
      .groupBy((groupCols :+ memberCol).map(col): _*)
      .agg((sum(col(valueCol).cast("decimal(18,2)")) * lit(100))
        .cast("long").as("_x"))
    val wr = Window.partitionBy(groupCols.map(col): _*).orderBy(col("_x"))
    val ranked = cents.withColumn("_i", row_number().over(wr).cast("long"))
    def d38(c: Column): Column = c.cast("decimal(38,0)")
    val agg = ranked.groupBy(groupCols.map(col): _*).agg(
      count(lit(1)).as("n_members"),
      sum(d38(col("_x"))).as("_sx"),
      sum(d38(col("_i")) * d38(col("_x"))).as("_swx"))
    def dd(c: Column): Column = c.cast("double")
    val nD = col("n_members").cast("double")
    val g = lit(2.0) * dd(col("_swx")) / (nD * dd(col("_sx"))) -
      (nD + lit(1.0)) / nD
    val ok = col("n_members") >= 1L && dd(col("_sx")) > 0.0
    agg.select(groupCols.map(col) ++ Seq(col("n_members"),
        (round(dd(col("_sx")) / lit(100.0), 6) + lit(0.0)).as("total"),
        when(ok, round(g, 6) + lit(0.0)).as("gini")): _*)
      .orderBy(groupCols.map(col): _*)
  }

  /** Mann–Kendall trend test + Theil–Sen slope per series (Mann 1945;
    * Sen 1968) — the RANK-based monotone-trend detector beside the
    * parametric [[graft.operators.Labeling]] trend-scan: `S = Σ_{i<j}
    * sign(v_j − v_i)` with the tie-corrected variance
    *
    * {{{ Var(S) = [n(n−1)(2n+5) − Σ_g t_g(t_g−1)(2t_g+5)] / 18 }}}
    *
    * and the continuity-corrected z; the slope estimate is the MEDIAN
    * of all pairwise slopes — robust to ~29% outliers where OLS breaks.
    *
    * Determinism: signs and tie counts are exact integers on the
    * quantized tape; each pairwise slope `(v_j−v_i)/(t_j−t_i)` is the
    * identical integer-ratio double in both engines and the median is
    * exact-percentile interpolation (Spark `percentile` ≡ DuckDB
    * `quantile_cont` — the W9 contract); z and Var derive in one fixed
    * tree, 6 dp. Null z on zero variance (all values tied).
    *
    * Scale shape: the pairwise self-join is QUADRATIC per key by
    * construction — feed it coarse bars (daily, weekly), never raw
    * ticks; a key with more than `maxBuckets` buckets fails loudly
    * (the [[hayashiYoshida]] guard precedent) instead of silently
    * exploding n² on an executor. */
  def mannKendall(df: DataFrame, keyCol: String, bucketCol: String,
                  valueCol: String, scale: Double = 1e4,
                  maxBuckets: Int = 4096): DataFrame = {
    require(maxBuckets >= 2, s"maxBuckets must be >= 2, got $maxBuckets")
    val base = quantizedBase(df, keyCol, bucketCol, valueCol, scale)
      .withColumn("_t", col("_t").cast("long"))
    val over = base.groupBy(col("_k")).count()
      .where(col("count") > maxBuckets.toLong).limit(1).collect()
    require(over.isEmpty,
      s"mannKendall saw a series with ${over.headOption.map(_.getLong(1)).getOrElse(0L)} " +
        s"buckets > maxBuckets=$maxBuckets — the pairwise join is quadratic " +
        "per key; aggregate to coarser bars upstream or raise the budget")
    val pairs = base.as("i").join(base.as("j"),
        col("j._k") === col("i._k") && col("j._t") > col("i._t"))
      .select(col("i._k").as("_k"),
        signum((col("j._v") - col("i._v")).cast("double")).cast("long").as("_sgn"),
        ((col("j._v") - col("i._v")).cast("double") /
          (col("j._t") - col("i._t")).cast("double")).as("_slope"))
    val pAgg = pairs.groupBy(col("_k")).agg(
        sum(col("_sgn")).as("s_stat"),
        percentile(col("_slope"), lit(0.5)).as("_med"))
      .toDF("_k", "s_stat", "_med")
    val ties = base.groupBy(col("_k"), col("_v")).agg(count(lit(1)).as("_tc"))
      .groupBy(col("_k")).agg(
        count(lit(1)).as("_nv"),
        sum(col("_tc")).as("n"),
        sum(col("_tc") * (col("_tc") - 1L) * (lit(2L) * col("_tc") + 5L))
          .as("_tie"))
      .toDF("_k", "_nv", "n", "_tie")
    val j = ties.join(pAgg, Seq("_k"), "left")
    val nD = col("n").cast("double")
    val varS = (nD * (nD - lit(1.0)) * (lit(2.0) * nD + lit(5.0)) -
      col("_tie").cast("double")) / lit(18.0)
    val sD = col("s_stat").cast("double")
    val z = when(col("s_stat") > 0L, (sD - lit(1.0)) / sqrt(varS))
      .when(col("s_stat") < 0L, (sD + lit(1.0)) / sqrt(varS))
      .otherwise(lit(0.0))
    j.select(col("_k").as("key"), col("n"), col("s_stat"),
        (round(varS, 6) + lit(0.0)).as("var_s"),
        when(col("_med").isNotNull,
          round(col("_med") / lit(scale), 6) + lit(0.0)).as("theil_sen"),
        when(varS > 0.0, round(z, 6) + lit(0.0)).as("z"),
        when(varS > 0.0, abs(z) > lit(Z975)).as("trend_5pct"))
      .orderBy("key")
  }

  /** Sample entropy (Richman & Moorman 2000, AJP 278), m = 2, per
    * series — the regularity/complexity gauge beside [[permEntropy]]'s
    * ordinal patterns and the LZ76 production complexity: `SampEn =
    * −ln(A/B)` where `B` counts template pairs whose m-point Chebyshev
    * distance is ≤ r and `A` the same with the (m+1)-th point
    * appended. Low SampEn = self-similar/regular tape; white noise
    * sits near `ln` of the tolerance coverage. Self-matches are
    * excluded (i < j), overlapping templates count (the standard
    * convention); both counts run over the templates whose (m+1)-th
    * point exists.
    *
    * Determinism: the tolerance re-quantizes as `r = ⌊rFactor·σ_q⌋`
    * with σ_q the exact-moment sample std in quantized units (both
    * engines floor the same double), so every Chebyshev comparison is
    * INTEGER-exact and A/B are exact counts; the final `−ln(A/B)` is
    * the only libm call, 6 dp. Null SampEn when A = 0 or B = 0.
    *
    * Scale shape: embeddings are two shifted self-joins (consecutive
    * buckets only — a gap breaks the template, it never spans it); the
    * pair stage is QUADRATIC per key by construction — coarse bars
    * only, loud `maxBuckets` guard (the [[mannKendall]] precedent). */
  def sampleEntropy(df: DataFrame, keyCol: String, bucketCol: String,
                    valueCol: String, rFactor: Double = 0.2,
                    scale: Double = 1e4, maxBuckets: Int = 4096): DataFrame = {
    require(rFactor > 0.0, s"rFactor must be positive, got $rFactor")
    require(maxBuckets >= 4, s"maxBuckets must be >= 4, got $maxBuckets")
    val base = quantizedBase(df, keyCol, bucketCol, valueCol, scale)
      .withColumn("_t", col("_t").cast("long"))
    val over = base.groupBy(col("_k")).count()
      .where(col("count") > maxBuckets.toLong).limit(1).collect()
    require(over.isEmpty,
      s"sampleEntropy saw a series with ${over.headOption.map(_.getLong(1)).getOrElse(0L)} " +
        s"buckets > maxBuckets=$maxBuckets — the template-pair join is " +
        "quadratic per key; aggregate to coarser bars upstream or raise the budget")
    // exact-moment sample std in quantized units → integer tolerance
    val vD = col("_v").cast("decimal(38,0)")
    val mom = base.groupBy(col("_k")).agg(
        count(lit(1)).as("_n"), sum(vD).as("_m1"), sum(vD * vD).as("_m2"))
      .withColumn("_nd", col("_n").cast("double"))
      .withColumn("_sd", sqrt((col("_nd") * col("_m2").cast("double") -
        col("_m1").cast("double") * col("_m1").cast("double")) /
        (col("_nd") * (col("_nd") - lit(1.0)))))
      .select(col("_k").as("_km"), col("_n"),
        floor(lit(rFactor) * col("_sd")).cast("long").as("_r"))
    // m = 2 embeddings over consecutive buckets
    val emb = base.as("a").join(base.as("b"),
        col("b._k") === col("a._k") && col("b._t") === col("a._t") + 1L)
      .join(base.as("c"),
        col("c._k") === col("a._k") && col("c._t") === col("a._t") + 2L)
      .select(col("a._k").as("_k"), col("a._t").as("_t"),
        col("a._v").as("_v0"), col("b._v").as("_v1"), col("c._v").as("_v2"))
    val pairs = emb.as("i").join(emb.as("j"),
        col("j._k") === col("i._k") && col("j._t") > col("i._t"))
      .join(broadcast(mom), col("_km") === col("i._k"))
      .select(col("i._k").as("_k"), col("_n"), col("_r"),
        (greatest(abs(col("j._v0") - col("i._v0")),
          abs(col("j._v1") - col("i._v1"))) <= col("_r")).as("_bm"),
        (greatest(abs(col("j._v0") - col("i._v0")),
          abs(col("j._v1") - col("i._v1")),
          abs(col("j._v2") - col("i._v2"))) <= col("_r")).as("_am"))
    val agg = pairs.groupBy(col("_k")).agg(
      min(col("_n")).as("n"), min(col("_r")).as("_rq"),
      sum(when(col("_bm"), lit(1L)).otherwise(lit(0L))).as("b_count"),
      sum(when(col("_am"), lit(1L)).otherwise(lit(0L))).as("a_count"))
    val sampen = -log(col("a_count").cast("double") /
      col("b_count").cast("double"))
    agg.select(col("_k").as("key"), col("n"), col("b_count"), col("a_count"),
        (round(col("_rq").cast("double") / lit(scale), 6) + lit(0.0))
          .as("r_tol"),
        when(col("a_count") > 0L && col("b_count") > 0L,
          round(sampen, 6) + lit(0.0)).as("sampen"))
      .orderBy("key")
  }

  /** Quandt–Andrews sup-F (Quandt 1960; Andrews 1993, Econometrica 61)
    * — [[chowTest]] with the break date UNKNOWN: compute the Chow F at
    * EVERY candidate split inside the 15%-trimmed interior and report
    * the supremum and where it lands. No 5% flag: sup-F's null
    * distribution is non-standard (Andrews' tables, trim-dependent) —
    * callers compare `sup_f` against the table for their trim; the
    * single-F large-n call lives on [[chowTest]].
    *
    * Scale story — this is the [[chowTest]] ladder WITHOUT a quadratic
    * blowup: one ordered keyed window materializes the PREFIX moment
    * sums at every row, the unordered key window the totals, so every
    * candidate's two segment fits derive from exact integer prefix/
    * complement images IN PLACE (the SADF bounded-ladder doctrine: one
    * keyed exchange, fan-out = the candidate count, zero joins).
    *
    * Determinism: cumulative DECIMAL(38,0) sums are exact at any
    * partitioning (distinct integral buckets order totally); every
    * F(τ) is the [[chowTest]] fixed tree; the sup resolves ties to the
    * EARLIEST candidate via `max(struct(f, −τ))` ≡ the oracle's
    * min-τ-at-max-f — deterministic because tied doubles are identical
    * trees. Candidates where either segment is degenerate (n < 3,
    * zero time-variance, RSS ≤ 0) drop out of the sup. 6 dp.
    *
    * Returns `(key, n, n_candidates, sup_f, break_bucket, break_frac)`
    * — `break_bucket` in ORIGINAL bucket units, `break_frac` the
    * position of the break in (0,1). */
  def supChow(df: DataFrame, keyCol: String, bucketCol: String,
              valueCol: String, scale: Double = 1e4,
              trim: Double = 0.15): DataFrame = {
    require(trim > 0.0 && trim < 0.5, s"need 0 < trim < 0.5, got $trim")
    val base = quantizedBase(df, keyCol, bucketCol, valueCol, scale)
      .withColumn("_t", col("_t").cast("long"))
    val wk = Window.partitionBy(col("_k"))
    val wo = Window.partitionBy(col("_k")).orderBy(col("_t"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    def d38(c: Column): Column = c.cast("decimal(38,0)")
    val seg = base
      .withColumn("_t0", min(col("_t")).over(wk))
      .withColumn("_ti", col("_t") - col("_t0"))
    val withMoments = seg
      .withColumn("_cn", count(lit(1)).over(wo))
      .withColumn("_cst", sum(d38(col("_ti"))).over(wo))
      .withColumn("_cstt", sum(d38(col("_ti")) * d38(col("_ti"))).over(wo))
      .withColumn("_csv", sum(d38(col("_v"))).over(wo))
      .withColumn("_csvv", sum(d38(col("_v")) * d38(col("_v"))).over(wo))
      .withColumn("_cstv", sum(d38(col("_ti")) * d38(col("_v"))).over(wo))
      .withColumn("_n", count(lit(1)).over(wk))
      .withColumn("_st", sum(d38(col("_ti"))).over(wk))
      .withColumn("_stt", sum(d38(col("_ti")) * d38(col("_ti"))).over(wk))
      .withColumn("_sv", sum(d38(col("_v"))).over(wk))
      .withColumn("_svv", sum(d38(col("_v")) * d38(col("_v"))).over(wk))
      .withColumn("_stv", sum(d38(col("_ti")) * d38(col("_v"))).over(wk))
    def dd(c: Column): Column = c.cast("double")
    def fit(n: Column, st: Column, stt: Column, sv: Column, svv: Column,
            stv: Column): (Column, Column) = {
      val nD = n.cast("double")
      val den = nD * dd(stt) - dd(st) * dd(st)
      val b = (nD * dd(stv) - dd(st) * dd(sv)) / den
      val a = (dd(sv) - b * dd(st)) / nD
      (dd(svv) - a * dd(sv) - b * dd(stv), den)
    }
    val n1 = col("_cn")
    val n2 = col("_n") - col("_cn")
    val (rss1, den1) = fit(n1, col("_cst"), col("_cstt"), col("_csv"),
      col("_csvv"), col("_cstv"))
    val (rss2, den2) = fit(n2, col("_st") - col("_cst"),
      col("_stt") - col("_cstt"), col("_sv") - col("_csv"),
      col("_svv") - col("_csvv"), col("_stv") - col("_cstv"))
    val (rssP, denP) = fit(col("_n"), col("_st"), col("_stt"), col("_sv"),
      col("_svv"), col("_stv"))
    val nD = col("_n").cast("double")
    val rssSum = rss1 + rss2
    val f = (rssP - rssSum) / lit(2.0) / (rssSum / (nD - lit(4.0)))
    val minSeg = greatest(lit(3L), ceil(lit(trim) * nD).cast("long"))
    val cand = withMoments
      .withColumn("_f",
        when(n1 >= minSeg && n2 >= minSeg && den1 > 0.0 && den2 > 0.0 &&
          denP > 0.0 && rssSum > 0.0, f))
      .where(col("_f").isNotNull)
    val agg = cand.groupBy(col("_k").as("key")).agg(
      min(col("_n")).as("n"), count(lit(1)).as("n_candidates"),
      max(col("_f")).as("_supf"),
      max(struct(col("_f").as("_fv"), (lit(-1L) * col("_ti")).as("_negt"),
        (lit(-1L) * col("_t0")).as("_negt0"))).as("_arg"))
    agg.select(col("key"), col("n"), col("n_candidates"),
        (round(col("_supf"), 6) + lit(0.0)).as("sup_f"),
        (lit(-1L) * col("_arg._negt") + lit(-1L) * col("_arg._negt0"))
          .as("break_bucket"),
        (round((lit(-1L) * col("_arg._negt")).cast("double") /
          col("n").cast("double"), 6) + lit(0.0)).as("break_frac"))
      .orderBy("key")
  }

  /** χ²(df) 95% critical values for the small degrees of freedom the
    * rank tests use — public so oracles interpolate the same doubles. */
  val Chi2Crit5PctByDf: Map[Int, Double] = Map(
    1 -> 3.841458820694124, 2 -> 5.991464547107979, 3 -> 7.814727903251179,
    4 -> 9.487729036781154, 5 -> 11.070497693516351, 6 -> 12.591587243743977,
    7 -> 14.067140449340169, 8 -> 15.50731305586545)

  /** Kruskal–Wallis rank test ACROSS series (Kruskal & Wallis 1952):
    * do the keys' value distributions share a location? — the k-sample
    * omnibus companion of the two-sample drift tests ([[ksTwoSample]]
    * across time, this across series). Midranks handle ties; the
    * tie-corrected statistic
    *
    * {{{ H = 12/(N(N+1)) · Σ_j R_j²/n_j − 3(N+1)
    *     H_adj = H / (1 − Σ(w³−w)/(N³−N)) ~ χ²(k−1) }}}
    *
    * Determinism: DOUBLED midranks `2m_v = 2·F_<(v) + w_v + 1` are
    * exact integers on the quantized value histogram, so the doubled
    * rank sums `2R_j = Σ c_jv·2m_v` accumulate exactly
    * (DECIMAL(38,0)/HUGEINT); each group's `R_j²/n_j` term re-quantizes
    * to a ⌊·10⁶⌋ image so the cross-group reduction is order-free
    * (the µnat scheme); the 5% call reads [[Chi2Crit5PctByDf]] at k−1
    * (null when k−1 is outside the table).
    *
    * Scale shape: the ordered window runs over the VALUE HISTOGRAM
    * (distinct quantized values), never the corpus — the corpus
    * contributes one (key, value) count agg; the histogram frame is
    * bounded by value cardinality — coarsen `scale` before feeding
    * raw high-precision ticks.
    *
    * Returns one row: `(n, k_groups, h, h_adj, reject_5pct)`. */
  def kruskalWallis(df: DataFrame, keyCol: String, bucketCol: String,
                    valueCol: String, scale: Double = 1e4): DataFrame = {
    val base = quantizedBase(df, keyCol, bucketCol, valueCol, scale)
    val kv = base.groupBy(col("_k"), col("_v")).agg(count(lit(1)).as("_c"))
    val vh = kv.groupBy(col("_v")).agg(sum(col("_c")).as("_w"))
    val wv = Window.orderBy(col("_v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val ranked = vh
      .withColumn("_fle", sum(col("_w")).over(wv))
      .withColumn("_m2", lit(2L) * (col("_fle") - col("_w")) + col("_w") + lit(1L))
    def d38(c: Column): Column = c.cast("decimal(38,0)")
    val perKey = kv.join(ranked.select(col("_v"), col("_m2")), Seq("_v"))
      .groupBy(col("_k")).agg(
        sum(col("_c")).as("_nj"),
        sum(d38(col("_c")) * d38(col("_m2"))).as("_r2j"))
    def dd(c: Column): Column = c.cast("double")
    // Σ R_j²/n_j with R_j = (2R_j)/2 — fold per-group terms through
    // ⌊·10⁶⌋ integers so the cross-group reduction is order-free
    val term = dd(col("_r2j")) * dd(col("_r2j")) / lit(4.0) /
      col("_nj").cast("double")
    val keyAgg = perKey
      .withColumn("_tq", floor(term * lit(1e6)).cast("long"))
      .agg(count(lit(1)).as("k_groups"), sum(col("_nj")).as("n"),
        sum(col("_tq")).as("_sq"))
    val tieAgg = vh.select(
      sum(d38(col("_w")) * d38(col("_w")) * d38(col("_w")) - d38(col("_w")))
        .as("_tie")).withColumn("_j", lit(1))
    val j = keyAgg.withColumn("_j", lit(1))
      .join(broadcast(tieAgg), Seq("_j")).drop("_j")
    val nD = col("n").cast("double")
    val h = lit(12.0) / (nD * (nD + lit(1.0))) *
      (col("_sq").cast("double") / lit(1e6)) - lit(3.0) * (nD + lit(1.0))
    val corr = lit(1.0) - col("_tie").cast("double") / (nD * nD * nD - nD)
    val hAdj = h / corr
    val df1 = col("k_groups") - lit(1L)
    val critCol = Chi2Crit5PctByDf.foldLeft(lit(null).cast("double")) {
      case (acc, (d, c)) => when(df1 === d.toLong, lit(c)).otherwise(acc)
    }
    val ok = col("n") >= 2L && col("k_groups") >= 2L && corr > 0.0
    j.select(col("n"), col("k_groups"),
        when(ok, round(h, 6) + lit(0.0)).as("h"),
        when(ok, round(hAdj, 6) + lit(0.0)).as("h_adj"),
        when(ok && critCol.isNotNull, hAdj > critCol).as("reject_5pct"))
  }

  /** Shared χ²(df)/df large-n F critical lookup for the ANOVA-style
    * tests ([[brownForsythe]]) — F(df, ∞) = χ²(df)/df; the exact
    * F(df, N−k) critical differs in the second decimal at N ≈ 10²
    * (documented, the [[granger]] convention). */
  private def fCritLargeN(df1: Column): Column =
    Chi2Crit5PctByDf.foldLeft(lit(null).cast("double")) {
      case (acc, (d, c)) => when(df1 === d.toLong, lit(c / d)).otherwise(acc)
    }

  /** Brown–Forsythe / median-Levene test ACROSS series (Brown &
    * Forsythe 1974, JASA 69): do the keys share a SCALE? — the
    * dispersion companion of [[kruskalWallis]]'s location omnibus:
    * one-way ANOVA on the absolute deviations from each group's
    * MEDIAN (the median variant is the robust one — mean-Levene
    * chases the same outliers it is testing for),
    *
    * {{{ F = [Σ n_j(z̄_j − z̄)²/(k−1)] / [Σ(z − z̄_j)²/(N−k)] }}}
    *
    * Determinism: the doubled deviations `z₂ = |2v − 2·med_j|` are
    * EXACT integers (2·median of integers is the exact integer sum of
    * the two middle order statistics — interpolated percentile at
    * p = ½); the per-group moment sums accumulate as DECIMAL(38,0)/
    * HUGEINT; each group's `(Σz)²/n` and SSW terms re-quantize
    * (⌊·10⁶⌋) for an order-free cross-group fold; F is one fixed tree
    * from those images (z₂'s doubling cancels — F is scale-invariant),
    * 6 dp; the 5% call is the large-n F(k−1, ∞) = χ²(k−1)/(k−1) from
    * the shared table.
    *
    * Scale shape: one grouped percentile, broadcast key-sized medians,
    * one map-side-combined moment agg, a key-count fold — the corpus
    * shuffles once. Returns one row:
    * `(n, k_groups, f_bf, reject_5pct)`. */
  def brownForsythe(df: DataFrame, keyCol: String, bucketCol: String,
                    valueCol: String, scale: Double = 1e4): DataFrame = {
    val base = quantizedBase(df, keyCol, bucketCol, valueCol, scale)
    val med = base.groupBy(col("_k")).agg(
        (percentile(col("_v").cast("double"), lit(0.5)) * lit(2.0)).as("_m2d"))
      .select(col("_k").as("_km"), col("_m2d").cast("long").as("_m2"))
    def d38(c: Column): Column = c.cast("decimal(38,0)")
    val z = base.join(broadcast(med), col("_km") === col("_k"))
      .withColumn("_z", abs(lit(2L) * col("_v") - col("_m2")))
    val grp = z.groupBy(col("_k")).agg(
      count(lit(1)).as("_nj"), sum(d38(col("_z"))).as("_sz"),
      sum(d38(col("_z")) * d38(col("_z"))).as("_szz"))
    def dd(c: Column): Column = c.cast("double")
    val njD = col("_nj").cast("double")
    // per-group images in VALUE units (divide the exact sums by the
    // doubling·scale factor BEFORE squaring — F is scale-invariant and
    // the quantized-unit squares would overflow the ⌊·10⁶⌋ BIGINT
    // image at panel scale): (Σz)²/n (between-groups building block)
    // and Σz² − (Σz)²/n (the group's within-SS) — µ-quantized for an
    // order-free cross-group reduction. Envelope: n·maxz²·10⁶ < 2⁶³ →
    // n ≲ 3·10⁷ rows per group at |v| ≤ 10³.
    val ds = lit(2.0 * scale)
    val bTerm = (dd(col("_sz")) / ds) * (dd(col("_sz")) / ds) / njD
    val wTerm = dd(col("_szz")) / (ds * ds) -
      (dd(col("_sz")) / ds) * (dd(col("_sz")) / ds) / njD
    val folded = grp
      .withColumn("_bq", floor(bTerm * lit(1e6)).cast("long"))
      .withColumn("_wq", floor(wTerm * lit(1e6)).cast("long"))
      .agg(count(lit(1)).as("k_groups"), sum(col("_nj")).as("n"),
        sum(d38(col("_sz"))).as("_szAll"),
        sum(col("_bq")).as("_b"), sum(col("_wq")).as("_w"))
    val nD = col("n").cast("double")
    val kD = col("k_groups").cast("double")
    val ssb = col("_b").cast("double") / lit(1e6) -
      (col("_szAll").cast("double") / ds) *
        (col("_szAll").cast("double") / ds) / nD
    val ssw = col("_w").cast("double") / lit(1e6)
    val f = (ssb / (kD - lit(1.0))) / (ssw / (nD - kD))
    val crit = fCritLargeN(col("k_groups") - lit(1L))
    val ok = col("k_groups") >= 2L && (nD - kD) > 0.0 && ssw > 0.0
    folded.select(col("n"), col("k_groups"),
        when(ok, round(f, 6) + lit(0.0)).as("f_bf"),
        when(ok && crit.isNotNull, f > crit).as("reject_5pct"))
  }

  /** Friedman rank test (Friedman 1937, JASA 32) — the BLOCKED
    * companion of [[kruskalWallis]]: rank the k series WITHIN each
    * complete bucket (block), so the common time effect every series
    * shares drops out before comparing locations,
    *
    * {{{ χ²_F = 12/(n·k·(k+1)) · Σ_j R_j² − 3·n·(k+1) ~ χ²(k−1) }}}
    *
    * over the n blocks where ALL k series report (incomplete buckets
    * drop — the classic complete-block design). Midranks break ties
    * inside a block; the statistic is the classic uncorrected one
    * (conservative under heavy ties — documented, rare on quantized
    * hourly means).
    *
    * Determinism: doubled within-block midranks `2m = 2F_< + w + 1`
    * are exact integers (the [[kruskalWallis]] scheme, per block);
    * doubled rank sums accumulate exactly; each group's `R_j²` term
    * re-quantizes (⌊·10⁶⌋) for the order-free cross-group fold; χ²_F
    * is one fixed tree, 6 dp; 5% from [[Chi2Crit5PctByDf]] at k−1.
    *
    * Scale shape: block completeness and ranks are (bucket)-keyed
    * windows/aggs — blocks are tiny (k rows); one (bucket, value)
    * agg, one keyed rank window, one group fold. Returns one row:
    * `(n_blocks, k_groups, chi2_f, reject_5pct)`. */
  def friedman(df: DataFrame, keyCol: String, bucketCol: String,
               valueCol: String, scale: Double = 1e4): DataFrame = {
    val base = quantizedBase(df, keyCol, bucketCol, valueCol, scale)
    val kTotal = base.agg(countDistinct(col("_k")).as("_kt"))
      .withColumn("_j", lit(1))
    val complete = base
      .withColumn("_cnt",
        count(lit(1)).over(Window.partitionBy(col("_t"))))
      .withColumn("_j", lit(1))
      .join(broadcast(kTotal), Seq("_j")).drop("_j")
      .where(col("_cnt") === col("_kt"))
    val tv = complete.groupBy(col("_t"), col("_v"))
      .agg(count(lit(1)).as("_w"))
    val wb = Window.partitionBy(col("_t")).orderBy(col("_v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val ranked = tv
      .withColumn("_fle", sum(col("_w")).over(wb))
      .withColumn("_m2", lit(2L) * (col("_fle") - col("_w")) + col("_w") + lit(1L))
    def d38(c: Column): Column = c.cast("decimal(38,0)")
    val perKey = complete.join(ranked.select(col("_t"), col("_v"), col("_m2")),
        Seq("_t", "_v"))
      .groupBy(col("_k")).agg(
        count(lit(1)).as("_nb"), sum(d38(col("_m2"))).as("_r2j"))
    def dd(c: Column): Column = c.cast("double")
    val term = dd(col("_r2j")) * dd(col("_r2j")) / lit(4.0)
    val folded = perKey
      .withColumn("_tq", floor(term * lit(1e6)).cast("long"))
      .agg(count(lit(1)).as("k_groups"), min(col("_nb")).as("n_blocks"),
        sum(col("_tq")).as("_sq"))
    val nD = col("n_blocks").cast("double")
    val kD = col("k_groups").cast("double")
    val chi2 = lit(12.0) / (nD * kD * (kD + lit(1.0))) *
      (col("_sq").cast("double") / lit(1e6)) -
      lit(3.0) * nD * (kD + lit(1.0))
    val critCol = Chi2Crit5PctByDf.foldLeft(lit(null).cast("double")) {
      case (acc, (d, c)) => when(col("k_groups") - lit(1L) === d.toLong,
        lit(c)).otherwise(acc)
    }
    val ok = col("n_blocks") >= 2L && col("k_groups") >= 2L
    folded.select(col("n_blocks"), col("k_groups"),
        when(ok, round(chi2, 6) + lit(0.0)).as("chi2_f"),
        when(ok && critCol.isNotNull, chi2 > critCol).as("reject_5pct"))
  }
}
