package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (SURVEY §7 M9).
  *
  * Brute-force cosine top-k is the correctness baseline (one broadcast of
  * the query vector, one scan, one top-k — no shuffle of the corpus).
  * The scale path is random-hyperplane LSH: per-vector signatures bucket
  * the corpus so a query probes only its bucket(s); buckets are plain
  * columns, so the index is just a partitioned/bucketed table at rest.
  */
object Similarity {

  /** Cast an array<float> embedding to array<double> for stable math. */
  def toDoubleVec(v: Column): Column = transform(v, x => x.cast("double"))

  /** Dot product via zip_with + left-fold (deterministic order). */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column =
    sqrt(aggregate(transform(a, x => x * x), lit(0.0), (acc, v) => acc + v))

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / nullif(norm(a) * norm(b), lit(0))

  /** Brute-force top-k by cosine against the vector of `queryId`.
    * The 1-row query side is broadcast; the corpus is scanned once. */
  def knnBrute(df: DataFrame, vecCol: String, idCol: String, queryId: Long,
               k: Int): DataFrame = {
    val q = df.filter(col(idCol) === queryId)
      .select(toDoubleVec(col(vecCol)).as("_qv"))
    df.filter(col(idCol) =!= queryId)
      .crossJoin(broadcast(q))
      .select(col(idCol), cosine(toDoubleVec(col(vecCol)), col("_qv")).as("cosine"))
      .orderBy(round(col("cosine"), 6).desc, col(idCol))
      .limit(k)
  }

  /** Deterministic pseudo-random hyperplane weight in [-1, 1] for
    * (table, plane, dim) — derived from xxhash64, no RNG state. */
  private def planeWeight(table: Int, plane: Int, dim: Column): Column =
    (pmod(xxhash64(lit(table), lit(plane), dim), lit(20001L)) - 10000L).cast("double") / 10000.0

  /** `planes`-bit random-hyperplane signature of a vector (sign of the
    * projection on each plane). Plane columns are built as siblings in a
    * Scala loop — no nested lambdas, stays in codegen. */
  def lshSignature(v: Column, planes: Int, table: Int): Column = {
    val bits = (0 until planes).map { p =>
      val proj = aggregate(
        zip_with(v, sequence(lit(0), size(v) - 1),
          (x, d) => x * planeWeight(table, p, d)),
        lit(0.0), (acc, x) => acc + x)
      when(proj > 0, shiftleft(lit(1L), p)).otherwise(lit(0L))
    }
    bits.reduce(_.bitwiseOR(_))
  }

  /** LSH-bucketed approximate top-k: candidates share the query's bucket
    * in at least one of `tables` signature tables; exact cosine ranks the
    * candidates. Probing cost ≈ corpus/2^planes per table instead of the
    * full scan. */
  def knnLsh(df: DataFrame, vecCol: String, idCol: String, queryId: Long,
             k: Int, planes: Int = 12, tables: Int = 4): DataFrame = {
    val v = toDoubleVec(col(vecCol))
    // persisted: the corpus scan and the query-row filter both read this
    // frame, and signature projection is the expensive part (interpreted
    // array folds per plane)
    val sigs = df.select(col(idCol).as("id"), v.as("v"),
      posexplode(array((0 until tables).map(t => lshSignature(v, planes, t)): _*))
        .as(Seq("table", "sig")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val qSigs = sigs.filter(col("id") === queryId)
      .select(col("table").as("qtable"), col("sig").as("qsig"), col("v").as("qv"))
    sigs.filter(col("id") =!= queryId)
      .join(broadcast(qSigs),
        col("table") === col("qtable") && col("sig") === col("qsig"))
      .select(col("id"), cosine(col("v"), col("qv")).as("cosine"))
      .groupBy("id").agg(max("cosine").as("cosine"))
      .orderBy(round(col("cosine"), 6).desc, col("id"))
      .limit(k)
  }
}
