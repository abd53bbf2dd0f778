package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** K-minimum-values (KMV) sketches (Bar-Yossef et al. 2002; Beyer et al.
  * SIGMOD'07 for the intersection form) — the set-operation sketch the
  * built-in HLL (`approx_count_distinct`) can't provide: HLL unions, but
  * only KMV-style sketches support INTERSECTION estimates, the "how much
  * do these corpora overlap" question (shared users between event types,
  * shared docs between crawls) at sketch cost instead of join cost.
  *
  * Engine-portable by construction: elements hash through the md5-based
  * 48-bit hash ([[TextAnalysis.tokenHash48]]), sketches are the k
  * smallest DISTINCT hashes per set (exact integer ordering), and the
  * estimators are fixed double expressions over exact integers — an
  * external oracle reproduces every estimate bit-for-bit.
  */
object Sketches {

  /** Per-set KMV sketch: `(set_id, h)`, the k smallest distinct hashes.
    * One distinct + one per-set window — sketch size is k rows per set
    * regardless of set cardinality. */
  def kmvSketch(df: DataFrame, setCol: String, elemCol: String,
                k: Int): DataFrame = {
    require(k >= 16, s"k < 16 estimates nothing useful, got $k")
    df.select(col(setCol).as("set_id"),
        TextAnalysis.tokenHash48(col(elemCol).cast("string")).as("h"))
      .distinct()
      .withColumn("_rk", row_number().over(
        Window.partitionBy("set_id").orderBy("h")))
      .where(col("_rk") <= k)
      .drop("_rk")
  }

  /** All-pairs set-intersection estimates WITH the exact contract (the
    * q_approx_distinct pattern: compute estimate and truth side by side,
    * emit a tolerance verdict): for each set pair, merge the two
    * sketches, keep the k smallest union hashes; the union estimate is
    * `(k−1)·2⁴⁸ / h_k` (or the exact union hash count when the merged
    * sketch has fewer than k hashes — then it IS the union), and the
    * intersection estimate is `ρ·U` with ρ = the fraction of merged-k
    * hashes present in BOTH sketches. Exact intersections come from a
    * distinct element self-join — the expensive truth the sketch
    * replaces at scale; `withExact = false` IS the 100-TB path: it
    * skips that self-join entirely (the sketch join touches k rows per
    * set pair) and returns `(set_a, set_b, est_intersection)` only.
    *
    * With the (default, oracle-checked) exact contract on, returns
    * `(set_a, set_b, est_intersection, exact_intersection, ok)`
    * ordered by pair. */
  def kmvOverlap(df: DataFrame, setCol: String, elemCol: String,
                 k: Int, tol: Double = 0.5,
                 withExact: Boolean = true): DataFrame = {
    val elems = df.select(col(setCol).as("set_id"),
      col(elemCol).cast("string").as("e")).distinct()
    val sk = kmvSketch(df, setCol, elemCol, k)
    val sets = elems.select(col("set_id")).distinct()
    val pairs = sets.as("x").join(sets.as("y"),
        col("x.set_id") < col("y.set_id"))
      .select(col("x.set_id").as("a"), col("y.set_id").as("b"))
    // per pair: tag each sketch hash with which side(s) hold it, rank
    // the union, keep the k smallest
    val tagged = pairs.join(sk,
        col("set_id") === col("a") || col("set_id") === col("b"))
      .groupBy("a", "b", "h")
      .agg(max(when(col("set_id") === col("a"), 1).otherwise(0)).as("in_a"),
        max(when(col("set_id") === col("b"), 1).otherwise(0)).as("in_b"))
      .withColumn("_rk", row_number().over(
        Window.partitionBy("a", "b").orderBy("h")))
      .where(col("_rk") <= k)
    val est = tagged.groupBy("a", "b")
      .agg(count(lit(1)).as("n_merged"), max(col("h")).as("h_k"),
        sum(col("in_a") * col("in_b")).as("n_both"))
      .withColumn("u_est",
        when(col("n_merged") < k, col("n_merged").cast("double"))
          .otherwise(lit((k - 1).toDouble) * lit(281474976710656.0)
            / col("h_k").cast("double")))
      .withColumn("est_intersection",
        (col("n_both").cast("double") / col("n_merged").cast("double"))
          * col("u_est"))
    if (!withExact)
      return est.select(col("a").as("set_a"), col("b").as("set_b"),
        col("est_intersection")).orderBy("set_a", "set_b")
    val exact = elems.as("ea").join(elems.as("eb"),
        col("ea.e") === col("eb.e") && col("ea.set_id") < col("eb.set_id"))
      .groupBy(col("ea.set_id").as("a"), col("eb.set_id").as("b"))
      .agg(count(lit(1)).as("exact_intersection"))
    est.join(exact, Seq("a", "b"), "left")
      .select(col("a").as("set_a"), col("b").as("set_b"),
        col("est_intersection"),
        coalesce(col("exact_intersection"), lit(0L)).as("exact_intersection"),
        (abs(col("est_intersection") - coalesce(col("exact_intersection"), lit(0L)))
          <= lit(tol) * greatest(coalesce(col("exact_intersection"), lit(0L)), lit(1L))
            .cast("double")).as("ok"))
      .orderBy("set_a", "set_b")
  }

  /** Count-min sketch heavy hitters (Cormode & Muthukrishnan 2005) WITH
    * the exact contract: build the `depth × width` counter grid
    * relationally (per hash row j, bucket = portable md5 hash of
    * `item:salt:j` mod width; one grouped count), estimate each
    * candidate's frequency as the MIN of its `depth` bucket counters,
    * and emit it next to the exact count plus the two CMS guarantees as
    * verdict columns: `one_sided` (est ≥ exact — the sketch only ever
    * OVERcounts, by collision mass) and `within_bound`
    * (`(est − exact) · width ≤ 3 · N` — the ε = 3/width error bar,
    * integer arithmetic end to end).
    *
    * Scale shape: the sketch is ONE grouped count onto ≤ depth·width
    * keys (map-side combined — the classic mergeable-summary property:
    * per-partition grids sum), broadcast into the candidate probe; the
    * exact side is the grouped count + global top-k heap the sketch
    * replaces at 100 TB (drop the exact columns there; the grid stays
    * a few KB at ANY corpus size). Everything is integer + md5 —
    * estimates reproduce bit-for-bit on any engine. */
  def cmsHeavyHitters(df: DataFrame, itemCol: String, topK: Int,
                      depth: Int = 4, width: Int = 1024,
                      salt: String = "cms"): DataFrame = {
    require(topK > 0, s"topK must be positive, got $topK")
    require(depth > 0 && width > 0, s"bad grid: depth=$depth width=$width")
    // the spreading repartition (the Dedup.shingleArrays lesson): a
    // single-file scan would run depth·N md5 hashes on 1-2 input
    // partitions; 8 B items spread far cheaper than they hash
    val items = df.select(col(itemCol).cast("string").as("item"))
      .where(col("item").isNotNull)
      .repartition(df.sparkSession.sparkContext.defaultParallelism)
    def bucket(item: org.apache.spark.sql.Column) =
      pmod(TextAnalysis.tokenHash48(
        concat(item, lit(":" + salt + ":"), col("j").cast("string"))),
        lit(width.toLong))
    val grid = items
      .withColumn("j", explode(sequence(lit(0L), lit(depth - 1L))))
      .groupBy(col("j"), bucket(col("item")).as("b"))
      .agg(count(lit(1)).as("c"))
    // N from the raw column, pre-repartition: the filter-on-j=0 grid
    // derivation looked free but Catalyst pushes the grouping-key
    // predicate below the aggregate into a THIRD hashed scan; a plain
    // count touches one column and no md5
    val n = df.where(col(itemCol).isNotNull).agg(count(lit(1)).as("n_total"))
    val exactTop = items.groupBy("item").agg(count(lit(1)).as("n_exact"))
      .orderBy(col("n_exact").desc, col("item")).limit(topK)
    exactTop
      .withColumn("j", explode(sequence(lit(0L), lit(depth - 1L))))
      .withColumn("b", bucket(col("item")))
      .join(broadcast(grid), Seq("j", "b"))
      .groupBy("item")
      .agg(max("n_exact").as("n_exact"), min("c").as("n_est"))
      .crossJoin(broadcast(n))
      .select(col("item"), col("n_exact"), col("n_est"),
        (col("n_est") >= col("n_exact")).as("one_sided"),
        ((col("n_est") - col("n_exact")) * width <= lit(3L) * col("n_total"))
          .as("within_bound"))
      .orderBy(col("n_exact").desc, col("item"))
  }
}
