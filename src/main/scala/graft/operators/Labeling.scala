package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-label generation for market series — the step between the
  * feature factory (`graft.features`) and a supervised dataset. The
  * reference builds naive fixed-horizon forward-return labels
  * (`adi/scripts/build_training_matrix.py` lead columns, W4); the
  * triple-barrier method is the standard upgrade: a label that reflects
  * WHICH exit a trade would actually have taken.
  */
object Labeling {

  /** Triple-barrier labels (López de Prado AFML ch. 3): for every
    * observation (entry) at price p₀, scan forward up to `horizonUs`;
    * label +1 if price first touches the upper barrier `p₀·(1+upPct)`,
    * −1 if it first touches the lower `p₀·(1−dnPct)`, 0 if neither does
    * before the time barrier. Ties (both barriers touched at the same
    * earliest µs by different ticks) resolve UP — a fixed documented
    * rule, not engine chance.
    *
    * Determinism: barrier prices are one IEEE multiply per entry (the
    * identical double tree on any engine), touch times aggregate as
    * exact integer-µs MINs, and the label is a fixed conditional over
    * them.
    *
    * Scale shape — a HORIZON-BUCKETED band join, linear by
    * construction: ticks land in bucket ⌊ts/H⌋ and every entry probes
    * exactly its own and the next bucket (a tick in `(t, t+H]` can live
    * nowhere else), so the bucket id joins as an EQUI key next to the
    * series key and the engine only ever inspects same-key SAME-BUCKET
    * pairs: ≤ 2·(H·tick-rate) per entry, a per-series constant — never
    * the all-same-key-pairs blowup. This bound holds on ANY engine
    * because it is in the join keys, not the physical strategy. (A
    * round-6 claim that the unbucketed key-join-with-range-residual
    * shape "measured linear" was traced in round 7 to the benchmark's
    * `count()` materialization letting Catalyst prune the join away —
    * the honest cost was quadratic-per-key. See BASELINE.md "honest
    * materialization".) The touch-time agg collapses the fan-out
    * straight back to one row per entry. At 100 TB bucket the storage
    * by the series key so the (key, bucket) shuffle co-locates.
    *
    * Returns one row per entry: `(keys…, ts_us, price, t_up_us,
    * t_dn_us, label)` — touch times null when that barrier was never
    * hit inside the horizon. */
  def tripleBarrier(df: DataFrame, keys: Seq[String], tsCol: String,
                    priceCol: String, idCol: String, horizonUs: Long,
                    upPct: Double, dnPct: Double,
                    passthrough: Seq[String] = Nil): DataFrame = {
    require(keys.nonEmpty,
      "tripleBarrier needs the series key(s) — for a genuinely single-" +
        "series frame add a literal key column (an empty key set would " +
        "cross every entry against every tick)")
    require(horizonUs > 0L, s"horizon must be positive, got $horizonUs")
    require(upPct > 0.0 && dnPct > 0.0 && dnPct < 1.0,
      s"need upPct > 0 and 0 < dnPct < 1, got $upPct/$dnPct")
    val base = df.select(
      (keys.map(col) :+ unix_micros(col(tsCol).cast("timestamp")).as("ts_us")
        :+ col(priceCol).cast("double").as("price")
        :+ col(idCol).as("_id")) ++
        passthrough.map(c => col(c).as(s"_pt_$c")): _*)
    // exact BIGINT floor division (ts may be pre-epoch negative)
    val ticks = base.withColumn("_bkt",
      expr(s"(ts_us - pmod(ts_us, ${horizonUs}L)) div ${horizonUs}L"))
    val entries = base.select(
      (keys.map(k => col(k).as(s"_e_$k")) :+ col("ts_us").as("_e_ts")
        :+ col("price").as("_e_p") :+ col("_id").as("_e_id")) ++
        passthrough.map(c => col(s"_pt_$c").as(s"_e_$c")): _*)
    // each entry probes its own bucket and the next: a tick in
    // (e_ts, e_ts+H] has ⌊ts/H⌋ ∈ {⌊e_ts/H⌋, ⌊e_ts/H⌋+1}
    val probes = entries
      .withColumn("_d", explode(array(lit(0L), lit(1L))))
      .withColumn("_e_bkt",
        expr(s"(_e_ts - pmod(_e_ts, ${horizonUs}L)) div ${horizonUs}L") + col("_d"))
      .drop("_d")
    val joinCond = (keys.map(k => col(s"_e_$k") === col(k)) :+
      (col("_e_bkt") === col("_bkt"))).reduce(_ && _) &&
      col("ts_us") > col("_e_ts") &&
      col("ts_us") <= col("_e_ts") + lit(horizonUs)
    val up = col("price") >= col("_e_p") * lit(1.0 + upPct)
    val dn = col("price") <= col("_e_p") * lit(1.0 - dnPct)
    // each (entry, tick) pair matches in exactly one bucket, so the
    // MINs aggregate each pair once — the probe duplication folds away
    val hits = probes.join(ticks, joinCond)
      .groupBy((keys.map(k => col(s"_e_$k")) :+ col("_e_ts") :+ col("_e_id")): _*)
      .agg(min(when(up, col("ts_us"))).as("t_up_us"),
        min(when(dn, col("ts_us"))).as("t_dn_us"))
    val joined = entries.join(hits,
      keys.map(k => s"_e_$k") :+ "_e_ts" :+ "_e_id", "left")
    joined.select(
      (keys.map(k => col(s"_e_$k").as(k)) :+ col("_e_ts").as("ts_us")
        :+ col("_e_p").as("price")) ++
        passthrough.map(c => col(s"_e_$c").as(c)) ++
        Seq(col("t_up_us"), col("t_dn_us"),
          when(col("t_up_us").isNotNull &&
              (col("t_dn_us").isNull || col("t_up_us") <= col("t_dn_us")), lit(1L))
            .when(col("t_dn_us").isNotNull, lit(-1L))
            .otherwise(lit(0L)).as("label")): _*)
  }

  /** Trend-scanning labels (López de Prado, "Machine Learning for
    * Asset Managers" §5.3): for every observation, fit an OLS line to
    * each FORWARD window of `spans` rows, keep the span whose slope
    * carries the largest |t-statistic|, and label by that slope's sign
    * — a horizon-free trend label that replaces the fixed-horizon
    * guesswork of naive forward returns.
    *
    * Determinism: values quantize to `round(v·quantScale)` BIGINTs and
    * every regression sum (Σy, Σry, Σy²) is an EXACT integer window
    * sum; the t-statistic is scale-invariant, so computing it in quant
    * units changes nothing; slope/t derive in one fixed double tree,
    * 6 dp. Ties across spans break to the SHORTEST span (compared on
    * the rounded |t|); a residual-free fit (an exactly linear window —
    * infinite t) reports the signed sentinel ±1e9 so it outranks every
    * finite t deterministically instead of tripping engine-specific
    * inf/NaN semantics. The x-regressor is the in-window row offset
    * 0..L−1, recovered from the global per-series row number r as
    * Σx·y = Σr·y − r_t·Σy — exact BIGINT algebra.
    *
    * Overflow contract: `n_rows_per_series · |v|·quantScale · L < 2⁶³`
    * (the Σry term binds) — at quantScale 100, L ≤ 32 that allows ~10¹³
    * value-units·rows per series, far past any real series.
    *
    * Scale shape: one keyed window sort shared by ALL spans' frames
    * (same partition+order ⇒ one exchange+sort, the sums are sibling
    * frames over it); no joins, no driver data. Tail rows compete only
    * among the spans that still fit a full forward window (short spans
    * keep labeling as the tail narrows); a row emits null label only
    * when NO span fits — callers wanting the strict all-spans purge
    * should drop the last `max(spans)−1` rows per series.
    *
    * Returns `(keys…, tsCol, tiebreakCol, value, best_span, t_value,
    * slope, label)` — slope de-scaled back to value units/row. */
  def trendScanLabel(df: DataFrame, keys: Seq[String], tsCol: String,
                     valueCol: String, tiebreakCol: String,
                     spans: Seq[Int], quantScale: Double = 100.0): DataFrame = {
    require(keys.nonEmpty, "trendScanLabel needs the series key(s)")
    require(spans.nonEmpty && spans.forall(_ >= 3),
      s"every span needs >= 3 rows (t needs L-2 > 0 df), got $spans")
    require(spans.distinct.size == spans.size, s"duplicate spans in $spans")
    require(quantScale > 0.0, s"need a positive quantScale, got $quantScale")
    // L·Σ(x−x̄)² over x = 0..L−1, an exact Long for every L (see below)
    def nSxx(l: Int): Long = { val ll = l.toLong; ll * ll * (ll * ll - 1) / 12 }
    val ls = spans.sorted
    val v = col(valueCol).cast("double")
    val ord = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(tsCol), col(tiebreakCol))
    def fwd(l: Int) = ord.rowsBetween(Window.currentRow, l - 1)
    val base = df.where(v.isNotNull)
      .withColumn("_c", round(v * lit(quantScale)).cast("long"))
      .withColumn("_rn", row_number().over(ord).cast("long"))
    // per-span regression sums as sibling window aggregates — exact ints
    val withSums = ls.foldLeft(base) { (acc, l) =>
      acc.withColumn(s"_n$l", count(lit(1)).over(fwd(l)))
        .withColumn(s"_sy$l", sum(col("_c")).over(fwd(l)))
        .withColumn(s"_sry$l", sum(col("_rn") * col("_c")).over(fwd(l)))
        .withColumn(s"_syy$l", sum(col("_c") * col("_c")).over(fwd(l)))
    }
    // t-statistic per span: slope = num/(L·Sxx_c), num = L·Σxy − Sx·Σy
    // (all BIGINT), SSE·L = (L·Σy² − Σy²ᵀ…) − slope·num — one double tree
    val withT = ls.foldLeft(withSums) { (acc, l) =>
      val L = lit(l.toLong)
      val sx = lit(l.toLong * (l - 1) / 2)                // Σx, exact
      val sxy = col(s"_sry$l") - col("_rn") * col(s"_sy$l")
      val num = L * sxy - sx * col(s"_sy$l")              // BIGINT
      // L·Σ(x−x̄)² = L²(L²−1)/12: ALWAYS an exact integer (L even ⇒ L²
      // supplies the 4; L odd ⇒ (L−1)(L+1) does; one of L−1,L,L+1 the 3)
      // — unlike Σ(x−x̄)² = L(L²−1)/12 alone, non-integer for L ≡ 2 mod 4.
      val den = lit(nSxx(l).toDouble)
      val slope = num.cast("double") / den
      val sseL = (L * col(s"_syy$l") - col(s"_sy$l") * col(s"_sy$l"))
        .cast("double") - slope * num.cast("double")      // = L·SSE
      val t = slope / sqrt(sseL / lit((l - 2).toDouble * nSxx(l)))
      acc.withColumn(s"_num$l", num)
        .withColumn(s"_t$l",
          when(col(s"_n$l") =!= l, lit(null).cast("double"))
            .when(sseL > 0.0, round(t, 6))
            .when(num === 0L, lit(0.0))
            .otherwise(signum(num.cast("double")) * lit(1e9)))
    }
    def a(l: Int) = abs(col(s"_t$l"))
    // shortest span wins ties on the ROUNDED |t| — a fixed CASE chain
    val bestSpan = ls.zipWithIndex.foldRight(lit(null).cast("int")) {
      case ((l, i), rest) =>
        val beatsLater = ls.drop(i + 1)
          .map(m => col(s"_t$m").isNull || a(l) >= a(m))
          .foldLeft(lit(true))(_ && _)
        when(col(s"_t$l").isNotNull && beatsLater, lit(l)).otherwise(rest)
    }
    def pick(f: Int => Column) = ls.foldRight(lit(null).cast("double")) {
      (l, rest) => when(col("_best") === l, f(l)).otherwise(rest)
    }
    withT.withColumn("_best", bestSpan)
      .select(keys.map(col) ++ Seq(col(tsCol), col(tiebreakCol),
        v.as("value"),
        col("_best").as("best_span"),
        pick(l => col(s"_t$l")).as("t_value"),
        pick(l => round(col(s"_num$l").cast("double") /
          lit(nSxx(l).toDouble * quantScale), 6)).as("slope"),
        pick(l => when(col(s"_num$l") > 0L, lit(1.0))
          .when(col(s"_num$l") < 0L, lit(-1.0)).otherwise(lit(0.0)))
          .cast("long").as("label")): _*)
  }

  /** Average label uniqueness and sample weights (AFML ch. 4
    * §4.3–4.5): triple-barrier-style labels OVERLAP in time, so
    * observations are not IID — a tick covered by c concurrent labels
    * contributes only 1/c of a unique observation to each. A label's
    * average uniqueness `ū = mean over its span's ticks of 1/c_t`
    * discounts redundant samples, and the per-series weights
    * `w = ū·N/Σū` (mean 1) are the standard bagging/boosting sample
    * weights over overlapping financial labels.
    *
    * Inputs: `ticks` is the observation clock (`keys`, `tsCol` in
    * integer µs); `spans` carries one row per label (`keys`, `idCol`,
    * `t0Col`/`t1Col` µs, inclusive). Spans are matched to ticks by a
    * BUCKETED band join on ⌊t/bucketUs⌋ — a span explodes to
    * `(t1−t0)/bucketUs + 1` buckets, so size `bucketUs` near the
    * label horizon and the fan-out is ≤ 2 rows per span (semantics
    * hold for ANY positive bucketUs; only the fan-out changes). Pair
    * volume is Σ span tick-lengths — the same bound as the
    * [[tripleBarrier]] probe itself.
    *
    * Determinism: concurrency `c_t` is an exact integer COUNT over the
    * pair frame; per-tick contributions quantize to `round(10⁹/c)`
    * BIGINTs and sum exactly; ū and w are each one fixed double tree
    * over exact integers, 6 dp (w from ū's exact ·10⁶ integer image).
    * Labels whose span covers no tick drop from the output
    * (an empty mean is undefined — the caller's data bug to surface).
    *
    * Scale shape (round 11, the O(ticks + spans) sweep the round-10
    * doc promised): NO tick×span pair frame. One pre-aggregation to
    * distinct tick instants `(keys, ts, m)`, then ONE keyed window
    * sweep over the union of three skinny row kinds —
    * concurrency DELTAS (+1 at t0, −1 at t1+1), TICK rows, and span
    * endpoint PROBES (+ at t1, − at t0−1), ordered (ts, kind) so at a
    * tick row the running Σdelta IS the covering-span count s, the
    * running sums `S = Σ m·round(10⁹/(m·s))` and `M = Σ m` are the
    * per-span-share prefix sums, and at a probe row those running sums
    * read as the as-of lookup S(last tick ≤ probe ts) for free. A
    * span's exact quantized sum is then `su = S(t1) − S(t0⁻)` and its
    * tick count `n = M(t1) − M(t0⁻)` — one groupBy over 2 probe rows
    * per span. Work is O(ticks + spans) regardless of span length or
    * concurrency: a 100× denser tick grid under horizon-length labels
    * grows the old pair frame ~quadratically but this sweep linearly
    * (see BASELINE.md round-11 density rehearsal).
    *
    * `bucketUs` is vestigial of the retired band-join shape: validated
    * positive (same contract) but no longer affects plan or result —
    * the bucket-invariance property the old doc promised is now
    * structural.
    *
    * Returns `(keys…, idCol, t0_us, t1_us, n_ticks, uniqueness,
    * weight)`. */
  /** Distinct tick instants with multiplicity m (duplicate (keys, ts)
    * rows multiply concurrency exactly like the retired pair frame
    * did: each of the m instances × s covering spans was one pair
    * row). */
  private def tickInstants(ticks: DataFrame, keys: Seq[String],
                           tsCol: String): DataFrame =
    ticks.select(keys.map(col) :+ col(tsCol).cast("long").as("_ts"): _*)
      .where(col("_ts").isNotNull)
      .groupBy((keys :+ "_ts").map(col): _*)
      .agg(count(lit(1)).as("_m"))

  private def spanShape(df: DataFrame, keys: Seq[String], idCol: String,
                        t0Col: String, t1Col: String): DataFrame =
    df.select(keys.map(col) ++ Seq(col(idCol).as("_id"),
        col(t0Col).cast("long").as("_t0"),
        col(t1Col).cast("long").as("_t1")): _*)
      .where(col("_t0").isNotNull && col("_t1").isNotNull &&
        col("_t1") >= col("_t0"))

  /** The O(ticks + spans) delta/tick/probe sweep shared by
    * [[averageUniqueness]] and [[conditionalUniqueness]] — ONE
    * definition of the ordering, prefix-sum, and probe mechanics so
    * the two can never drift. Three skinny row kinds union into one
    * keyed window ordered (ts, kind):
    *  - kind 0, concurrency DELTAS from `deltaSrc` spans (+1 at t0,
    *    −1 at t1+1 — active on [t0, t1] inclusive; deltas at a ts
    *    sort before ticks, so a span starting exactly at a tick
    *    covers it);
    *  - kind 1, TICK rows from `tk` `(keys, _ts, _m)` — the running
    *    Σdelta IS the covering count c there, and `kernel(m, c)`
    *    yields the quantized contribution entering the prefix sum S
    *    (M accumulates m);
    *  - kind 2, span-endpoint PROBES from `probeSrc` (sign + at t1,
    *    − at t0−1; ticks at a ts sort before probes, so the probe
    *    reads an INCLUSIVE prefix at t1 / exclusive at t0).
    * A span's exact sum is S(t1) − S(t0⁻), its tick count
    * M(t1) − M(t0⁻) — one groupBy over 2 probe rows per span.
    *
    * Returns per-span `(keys…, _id, t0_us, t1_us, n_ticks, _su)` for
    * spans covering ≥ 1 tick. */
  private def uniquenessSweep(tk: DataFrame, deltaSrc: DataFrame,
                              probeSrc: DataFrame, keys: Seq[String],
                              kernel: (Column, Column) => Column): DataFrame = {
    val kCols = keys.map(col)
    def shaped(f: Int, ts: Column, d: Column, m: Column, sign: Column,
               id: Column, t0: Column, t1: Column, src: DataFrame) =
      src.select(kCols ++ Seq(ts.as("_ts"), lit(f).as("_f"), d.as("_d"),
        m.as("_m"), sign.as("_sign"), id.as("_id"),
        t0.as("_pt0"), t1.as("_pt1")): _*)
    val nl = lit(null).cast("long")
    val nid = lit(null).cast(probeSrc.schema("_id").dataType)
    val deltas = shaped(0, col("_t0"), lit(1L), nl, nl, nid, nl, nl, deltaSrc)
      .unionByName(shaped(0, col("_t1") + 1L, lit(-1L), nl, nl, nid, nl, nl,
        deltaSrc))
    val tickRows = shaped(1, col("_ts"), lit(0L), col("_m"), nl, nid, nl, nl, tk)
    val probes = shaped(2, col("_t1"), lit(0L), nl, lit(1L),
        col("_id"), col("_t0"), col("_t1"), probeSrc)
      .unionByName(shaped(2, col("_t0") - 1L, lit(0L), nl, lit(-1L),
        col("_id"), col("_t0"), col("_t1"), probeSrc))
    val w = Window.partitionBy(kCols: _*).orderBy(col("_ts"), col("_f"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val swept = deltas.unionByName(tickRows).unionByName(probes)
      .withColumn("_c", sum(col("_d")).over(w))
      .withColumn("_g", when(col("_f") === 1, kernel(col("_m"), col("_c"))))
      .withColumn("_mm", when(col("_f") === 1, col("_m")))
      .withColumn("_S", sum(col("_g")).over(w))
      .withColumn("_M", sum(col("_mm")).over(w))
    swept.where(col("_f") === 2)
      .groupBy((keys :+ "_id").map(col): _*)
      .agg(min("_pt0").as("t0_us"), min("_pt1").as("t1_us"),
        sum(col("_sign") * coalesce(col("_M"), lit(0L))).as("n_ticks"),
        sum(col("_sign") * coalesce(col("_S"), lit(0L))).as("_su"))
      .where(col("n_ticks") > 0L)
  }

  def averageUniqueness(ticks: DataFrame, spans: DataFrame,
                        keys: Seq[String], tsCol: String, idCol: String,
                        t0Col: String, t1Col: String,
                        bucketUs: Long): DataFrame = {
    require(keys.nonEmpty, "averageUniqueness needs the series key(s)")
    require(bucketUs > 0L, s"bucketUs must be positive, got $bucketUs")
    val kCols = keys.map(col)
    val tk = tickInstants(ticks, keys, tsCol)
    val sp = spanShape(spans, keys, idCol, t0Col, t1Col)
    // kernel: per tick instance 1/c where the pair-frame concurrency
    // c = m·s (multiplicity × covering spans); uncovered ticks (s = 0)
    // contribute nothing but still advance M
    val perSpan = uniquenessSweep(tk, deltaSrc = sp, probeSrc = sp, keys,
        kernel = (m, s) => when(s > 0L,
          m * round(lit(1e9) / (m * s).cast("double")).cast("long")))
      .withColumn("uniqueness",
        round(col("_su").cast("double") / 1e9 / col("n_ticks").cast("double"), 6))
      .withColumn("_uq", round(col("uniqueness") * 1e6).cast("long"))
    val wKey = Window.partitionBy(kCols: _*)
    perSpan
      .withColumn("weight",
        round(col("_uq").cast("double") * count(lit(1)).over(wKey).cast("double")
          / sum(col("_uq")).over(wKey).cast("double"), 6))
      .select(kCols ++ Seq(col("_id").as(idCol), col("t0_us"),
        col("t1_us"), col("n_ticks"), col("uniqueness"), col("weight")): _*)
  }

  /** Meta-labels (AFML ch. 3 §3.6): given a PRIMARY model's side
    * (−1/0/+1 in `sideCol`), the meta-label answers "was that side
    * right?" — 1 when the triple-barrier first touch realized in the
    * side's favor (`side·label > 0`), else 0 (including side 0 — no
    * bet can't be right — and the time-barrier 0 label — the
    * documented conservative convention: an unrealized trade earns no
    * credit). The meta-model then learns WHEN to trade, sizing the
    * primary signal — the standard precision filter over a
    * high-recall primary.
    *
    * Same determinism and horizon-bucketed band-join shape as
    * [[tripleBarrier]] (the side rides the entry row as a passthrough
    * column — no extra join). Returns one row per entry:
    * `(keys…, ts_us, price, side, t_up_us, t_dn_us, label,
    * meta_label)`. */
  def metaLabel(df: DataFrame, keys: Seq[String], tsCol: String,
                priceCol: String, idCol: String, sideCol: String,
                horizonUs: Long, upPct: Double, dnPct: Double): DataFrame =
    tripleBarrier(df, keys, tsCol, priceCol, idCol, horizonUs, upPct, dnPct,
        passthrough = Seq(sideCol))
      .withColumn("meta_label",
        (coalesce(col(sideCol).cast("double"), lit(0.0)) *
          col("label").cast("double") > 0.0).cast("long"))

  /** Candidate average uniqueness GIVEN an already-drawn span set
    * (AFML ch. 4 §4.5.2's inner loop): for every candidate span i,
    * `ū_i = mean over its ticks t of 1/(1 + c_drawn(t))` where
    * `c_drawn(t)` counts DRAWN spans covering t — the "+1" is
    * candidate i itself joining the concurrency it would create.
    * Same determinism contract as [[averageUniqueness]]: per tick
    * instance the contribution quantizes to `round(10⁹/(1+c))`
    * BIGINTs scaled by the instant's multiplicity m, ū is one fixed
    * double tree, 6 dp, and `uq = round(ū·10⁶)` is the exact integer
    * image downstream draws rank on.
    *
    * Same O(ticks + drawn + spans) sweep shape as
    * [[averageUniqueness]]: concurrency deltas come from the DRAWN
    * set only (2 rows per drawn span), candidates contribute only
    * their 2 endpoint probes — no tick×span frame at any density.
    * `drawn` may be empty (first draw: c = 0 everywhere, every ū = 1).
    *
    * Returns `(keys…, idCol, t0_us, t1_us, n_ticks, uniqueness, uq)`;
    * spans covering no tick drop (nothing to average). */
  def conditionalUniqueness(ticks: DataFrame, spans: DataFrame,
                            drawn: DataFrame, keys: Seq[String],
                            tsCol: String, idCol: String,
                            t0Col: String, t1Col: String): DataFrame =
    conditionalUniquenessPrepared(tickInstants(ticks, keys, tsCol),
      spanShape(spans, keys, idCol, t0Col, t1Col),
      drawn, keys, idCol, t0Col, t1Col)

  /** [[conditionalUniqueness]] over PRE-SHAPED tick/span frames — the
    * seam [[sequentialBootstrap]] uses to materialize the
    * draw-invariant inputs once instead of re-deriving them from the
    * raw corpus on every sequential pass (r13 optimization round). */
  private def conditionalUniquenessPrepared(tk: DataFrame, sp: DataFrame,
                            drawn: DataFrame, keys: Seq[String],
                            idCol: String,
                            t0Col: String, t1Col: String): DataFrame = {
    require(keys.nonEmpty, "conditionalUniqueness needs the series key(s)")
    val kCols = keys.map(col)
    val dr = spanShape(drawn, keys, idCol, t0Col, t1Col)
    // kernel: per tick instance 1/(1 + c_drawn) — the "+1" is the
    // candidate itself joining the concurrency it would create; deltas
    // come from the DRAWN set only, candidates probe only
    uniquenessSweep(tk, deltaSrc = dr, probeSrc = sp, keys,
        kernel = (m, c) => m * round(lit(1e9) /
          (lit(1L) + coalesce(c, lit(0L))).cast("double")).cast("long"))
      .withColumn("uniqueness",
        round(col("_su").cast("double") / 1e9 / col("n_ticks").cast("double"), 6))
      .withColumn("uq", greatest(round(col("uniqueness") * 1e6).cast("long"), lit(1L)))
      .select(kCols ++ Seq(col("_id").as(idCol), col("t0_us"), col("t1_us"),
        col("n_ticks"), col("uniqueness"), col("uq")): _*)
  }

  /** Sequential bootstrap (AFML ch. 4 §4.5.2): draw `nDraws` spans per
    * series WITH replacement, where each step's draw probability is
    * proportional to the candidate's average uniqueness GIVEN the spans
    * already drawn ([[conditionalUniqueness]]) — overlapping spans are
    * progressively down-weighted, so the bootstrap sample is closer to
    * IID than the naive uniform draw (the spec proves the down-weight
    * directly on a hand fixture).
    *
    * The draw itself is the deterministic portable-hash Gumbel rule
    * (the [[graft.operators.TextAnalysis.weightedSample]] /
    * `importanceResample` precedent): at step b, candidate i draws
    * `u = (h48(id:salt:b) + 1)/2⁴⁸` from the engine-portable md5 hash,
    * ranks by `key = round(ln(u)·10⁶)/uq_i` (one exact-int double
    * division; uq is [[conditionalUniqueness]]'s ·10⁶ integer image),
    * and the (key DESC, id) maximum per series wins — A-ES with k=1,
    * so P(i wins) ∝ uq_i exactly, and the whole draw SEQUENCE replays
    * in SQL with the b-th stage unrolled as CTEs (the kmeans-round
    * pattern). No RNG state, no seed-per-partition hazard; same corpus
    * + salt ⇒ same sample.
    *
    * Scale shape: `nDraws` sequential passes (the protocol is
    * inherently sequential), each one [[conditionalUniqueness]] sweep
    * O(ticks + spans) + one key-grouped top-1 — the drawn set (≤
    * nDraws·series rows) localCheckpoints between steps. Returns one
    * row per (series, draw): `(keys…, draw, idCol, t0_us, t1_us,
    * n_ticks, uniqueness, sample_key)`, draw = 1-based step index. */
  def sequentialBootstrap(ticks: DataFrame, spans: DataFrame,
                          keys: Seq[String], tsCol: String, idCol: String,
                          t0Col: String, t1Col: String,
                          nDraws: Int, salt: String = "seqboot"): DataFrame = {
    require(nDraws >= 1 && nDraws <= 64,
      s"nDraws must be in [1, 64] (each draw is one sequential pass), got $nDraws")
    val kCols = keys.map(col)
    val spark = ticks.sparkSession
    val empty = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      org.apache.spark.sql.types.StructType(
        spans.select(kCols :+ col(idCol).as(idCol): _*).schema.fields ++ Seq(
          org.apache.spark.sql.types.StructField("t0_us",
            org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("t1_us",
            org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("draw",
            org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("n_ticks",
            org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("uniqueness",
            org.apache.spark.sql.types.DoubleType),
          org.apache.spark.sql.types.StructField("sample_key",
            org.apache.spark.sql.types.DoubleType))))
    // r13 optimization round: the drawn set is ≤ nDraws·series rows (a
    // key-sized frame), so it rides the sequential passes as a
    // driver-collected LocalRelation instead of re-materializing the
    // growing union each draw (an O(draws²) checkpoint chain) — each
    // draw is exactly ONE scheduled job (the conditionalUniqueness
    // sweep + top-1, collected); values pass through untouched
    val drawnRows = Seq.newBuilder[org.apache.spark.sql.Row]
    def drawnAcc: DataFrame = spark.createDataFrame(
      java.util.Arrays.asList(drawnRows.result(): _*), empty.schema)
    // draw-invariant inputs materialize ONCE — every pass re-derived
    // them from the raw corpus before (scan + shuffle per draw)
    val tk = tickInstants(ticks, keys, tsCol).localCheckpoint(true)
    val sp = spanShape(spans, keys, idCol, t0Col, t1Col).localCheckpoint(true)
    (1 to nDraws).foreach { b =>
      val cand = conditionalUniquenessPrepared(tk, sp,
        drawnAcc.select(kCols ++ Seq(col(idCol), col("t0_us").as(t0Col),
          col("t1_us").as(t1Col)): _*),
        keys, idCol, t0Col, t1Col)
      val h = graft.operators.TextAnalysis.tokenHash48(
        concat(col(idCol).cast("string"), lit(s":$salt:$b")))
      val lnuFp = round(log((h.cast("double") + 1.0) / lit(281474976710656.0))
        * 1e6).cast("long")
      val keyed = cand.withColumn("sample_key",
        lnuFp.cast("double") / col("uq").cast("double"))
      val wk = Window.partitionBy(kCols: _*)
        .orderBy(col("sample_key").desc, col(idCol))
      val winner = keyed
        .withColumn("_rn", row_number().over(wk))
        .where(col("_rn") === 1)
        .select(kCols ++ Seq(col(idCol), col("t0_us"), col("t1_us"),
          lit(b.toLong).as("draw"), col("n_ticks"), col("uniqueness"),
          col("sample_key")): _*)
      drawnRows ++= winner.collect()
    }
    drawnAcc.select(kCols ++ Seq(col("draw"), col(idCol), col("t0_us"),
      col("t1_us"), col("n_ticks"), col("uniqueness"), col("sample_key")): _*)
  }
}
