package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal joins. The reference only ever needs the two-series special
  * case (`adi/app/features/processors/orderbook_features.py:133-137` —
  * reindex + ffill of best-ask onto best-bid timestamps, J4); these are the
  * general operators that pattern is a slice of, built for arbitrary key
  * cardinality and 100 TB inputs.
  *
  * Why not a join? Spark plans `l.ts >= r.ts` (as-of) or
  * `l.ts BETWEEN r.s AND r.e` (range) conditions without an equi-key as a
  * broadcast-nested-loop or cartesian product. WITH an equi-key the
  * engine still INSPECTS every same-key pair — the range condition is
  * only a residual filter on the join, so the cost is O(|L|·|R|) per
  * key group no matter how narrow the band is. (A round-6 measurement
  * that claimed this shape "ran linear" was traced in round 7 to the
  * benchmark's `count()` materialization: Catalyst eliminated the
  * entire join from the counted plan, so the timing never executed it
  * — honest materialization put the unbucketed [[Labeling.tripleBarrier]]
  * at 104 s for 100k events × 5 keys. See BASELINE.md "honest
  * materialization".) A BOUNDED band has the by-construction fix: put
  * ⌊ts/width⌋ in the join keys and probe the two adjacent buckets, so
  * only same-key same-bucket pairs are ever inspected —
  * [[Labeling.tripleBarrier]] does exactly this. The operators below
  * exist for the as-of/ffill shape, where the band is unbounded on one
  * side (every earlier right row qualifies) and no bucket width exists
  * — THERE the only safe plan is strictly O(|L|+|R|): a tagged-union
  * window pass instead of any join.
  */
object TemporalJoins {

  /** As-of join: attach to each left row the payload of the single right
    * row with the greatest `rightTs <= leftTs` (direction="backward") or
    * the least `rightTs >= leftTs` ("forward") within the same join key;
    * equal timestamps match. Left rows with no qualifying right row keep
    * null payload (left-outer semantics, like pandas `merge_asof` /
    * DuckDB `ASOF LEFT JOIN`).
    *
    * Plan: tag and union both sides, then one window pass per key ordered
    * by (ts, side) — the right side sorts before (backward) or after
    * (forward) left rows at equal ts — and forward/backward-fill the right
    * payload struct onto left rows. One shuffle on `keys`,
    * O(|L|+|R|) rows end to end, no candidate-pair blowup. The payload
    * travels as a single struct so a null payload FIELD in the matched
    * right row doesn't make the fill reach past it to an older row.
    *
    * Requirements: `right` must be unique per (keys, rightTs) — the fill
    * would otherwise pick a partition-order-dependent duplicate; dedupe
    * with [[Relational.lastWriteWins]] first. `payload` names must not
    * collide with left columns. Like every per-key window in this engine,
    * one key's rows sort within one task — keys are expected to be
    * series-grained (symbol, user, …), not constant.
    *
    * @param toleranceSec matches farther than this from the left row are
    *                     nulled out (pandas `merge_asof(tolerance=...)`).
    */
  def asofJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
               leftTs: String, rightTs: String, payload: Seq[String],
               direction: String = "backward",
               toleranceSec: Option[Long] = None): DataFrame = {
    require(direction == "backward" || direction == "forward",
      s"direction must be backward|forward, got $direction")
    require(payload.nonEmpty, "payload must name at least one right column")
    val clash = payload.toSet.intersect(left.columns.toSet)
    require(clash.isEmpty, s"payload collides with left columns: $clash")
    val backward = direction == "backward"
    // at equal ts the right row must be inside the fill frame:
    // backward fill looks at preceding rows -> right sorts first;
    // forward fill looks at following rows -> right sorts last
    val (leftSide, rightSide) = if (backward) (1, 0) else (0, 1)

    val leftCols = left.columns.toSeq
    val payloadStruct = struct(payload.map(col): _*)
    val l = left.select(
      leftCols.map(col) :+
        lit(leftSide).as("_side") :+
        col(leftTs).as("_ts") :+
        lit(null).cast(right.select(payloadStruct).schema.head.dataType).as("_r"): _*)
    val r = right.select(
      keys.map(col) ++
        leftCols.filterNot(keys.contains)
          .map(c => lit(null).cast(left.schema(c).dataType).as(c)) :+
        lit(rightSide).as("_side") :+
        col(rightTs).as("_ts") :+
        payloadStruct.as("_r"): _*)

    val w = Window.partitionBy(keys.map(col): _*).orderBy(col("_ts"), col("_side"))
    val filled =
      if (backward) last(col("_r"), ignoreNulls = true)
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
      else first(col("_r"), ignoreNulls = true)
        .over(w.rowsBetween(Window.currentRow, Window.unboundedFollowing))

    val matchedTs = col("_r").getField(rightTs) // only valid if rightTs ∈ payload
    val gated = toleranceSec match {
      case Some(tol) =>
        require(payload.contains(rightTs),
          "toleranceSec needs the right timestamp in the payload")
        val dist =
          if (backward) unix_micros(col("_ts")) - unix_micros(matchedTs)
          else unix_micros(matchedTs) - unix_micros(col("_ts"))
        when(dist <= tol * 1000000L, col("_r"))
      case None => col("_r")
    }

    l.unionByName(r)
      .withColumn("_r", filled)
      .filter(col("_side") === leftSide)
      .withColumn("_r", gated)
      .select(leftCols.map(col) ++ payload.map(p => col("_r").getField(p).as(p)): _*)
  }

  /** Point-in-interval range join: every (point, interval) pair with the
    * same key and `start <= ts < end` (inner semantics). Intervals with
    * `end <= start` are empty and match nothing.
    *
    * Plan: both sides are bucketed onto a fixed time grid — each interval
    * explodes into the buckets it overlaps, each point lands in exactly
    * one — turning the inequality join into a plain equi-join on
    * (keys, bucket) + a residual containment filter. Each qualifying pair
    * is produced exactly once (the point's bucket is unique), so no
    * post-join dedup. Shuffle volume is |points| + |intervals| ×
    * avg-buckets-per-interval; pick `bucketSec` near the typical interval
    * length so that factor stays ~1-2. Catalyst plans this as a hash or
    * sort-merge join — never a nested-loop — and AQE's skew split applies.
    */
  def rangeJoin(points: DataFrame, intervals: DataFrame, keys: Seq[String],
                tsCol: String, startCol: String, endCol: String,
                bucketSec: Long): DataFrame = {
    require(bucketSec > 0, "bucketSec must be positive")
    val clash = points.columns.toSet.intersect(intervals.columns.toSet) -- keys
    require(clash.isEmpty, s"non-key columns shared by both sides: $clash")
    val bucketUs = bucketSec * 1000000L
    val p = points.withColumn("_b", floor(unix_micros(col(tsCol)) / bucketUs))
    val iv = intervals
      .filter(col(endCol) > col(startCol))
      .withColumn("_b", explode(sequence(
        floor(unix_micros(col(startCol)) / bucketUs),
        floor((unix_micros(col(endCol)) - 1) / bucketUs)))) // end-exclusive
    p.join(iv, keys :+ "_b")
      .filter(col(tsCol) >= col(startCol) && col(tsCol) < col(endCol))
      .drop("_b")
  }
}
