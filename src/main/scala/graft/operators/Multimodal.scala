package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column handling (SURVEY §7 M9): image/audio/video as opaque
  * `binary` columns + typed metadata, with decode / feature-extract /
  * frame-sample as batched per-partition stages.
  *
  * The Spark-side plumbing — schema, batch shape, partition-parallel
  * execution, deterministic output contract — is real and tested. The
  * codec itself is STUBBED (this container ships no image/audio libs):
  * [[StubCodec]] derives deterministic pseudo-features from the bytes.
  * A production deployment swaps `Codec` for a JNI/ONNX-backed
  * implementation without touching the plumbing.
  */
object Multimodal {

  /** media table schema: id + opaque payload + typed metadata. */
  val MEDIA_SCHEMA: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("content", BinaryType),
    StructField("meta", StructType(Seq(
      StructField("format", StringType),
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("duration_ms", LongType))))))

  /** Decoder contract: bytes → fixed-width feature vector. Implementations
    * must be deterministic and thread-safe (instantiated once per
    * partition, reused across the batch — the model-loading pattern of
    * `adi/app/features/processors/nlp_embeddings.py:6-36`). */
  trait Codec extends Serializable {
    def featureDim: Int
    def decodeFeatures(content: Array[Byte]): Array[Float]
  }

  /** Deterministic stand-in for the real decoder (STUB — see class doc).
    * Features are scaled xxhash-like folds of the payload so tests can
    * assert exact values. */
  object StubCodec extends Codec {
    val featureDim = 8
    def decodeFeatures(content: Array[Byte]): Array[Float] = {
      val out = new Array[Float](featureDim)
      var i = 0
      while (i < featureDim) {
        var h = 1125899906842597L + i
        var j = 0
        while (j < content.length) { h = 31L * h + content(j); j += 1 }
        out(i) = ((h % 10000L) / 10000.0).toFloat
        i += 1
      }
      out
    }
  }

  /** Decode + feature-extract as a batched mapPartitions stage: the codec
    * is constructed once per partition; rows stream through in `batchSize`
    * groups (the batch shape a vectorized/ONNX backend needs). Output:
    * input columns + `features: array<float>`. */
  def withDecodedFeatures(df: DataFrame, contentCol: String, codec: Codec,
                          batchSize: Int = 64): DataFrame = {
    val spark = df.sparkSession
    val outSchema = StructType(df.schema.fields :+
      StructField("features", ArrayType(FloatType)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(outSchema)
    val idx = df.schema.fieldIndex(contentCol)
    df.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        // a real codec would run one vectorized inference call here
        batch.map { r =>
          val bytes = r.getAs[Array[Byte]](idx)
          val feats = if (bytes == null) null else codec.decodeFeatures(bytes)
          Row.fromSeq(r.toSeq :+ feats)
        }
      }
    }(enc)
  }

  /** Frame sampling for timed media: keep every nth frame index up to the
    * metadata duration — pure relational (sequence + explode), the decode
    * of each sampled frame is the stubbed stage above. */
  def sampleFrameIndexes(df: DataFrame, everyMs: Long): DataFrame =
    df.withColumn("frame_ms",
      explode(sequence(lit(0L),
        coalesce(col("meta.duration_ms"), lit(0L)), lit(everyMs))))

  /** Deterministic synthetic media table for tests/benchmarks (payload
    * bytes derived from the id; `contentModulus > 0` derives them from
    * `id % contentModulus` instead — planted byte-exact duplicates for
    * the dedup specs/oracles). */
  def syntheticMedia(spark: SparkSession, n: Int,
                     contentModulus: Int = 0): DataFrame = {
    import spark.implicits._
    spark.range(n.toLong).map { i =>
      val seed: Long = if (contentModulus > 0) i % contentModulus else i
      val bytes = Array.tabulate[Byte](64)(j => ((seed * 31 + j) % 127).toByte)
      (i, bytes, ("img", 64, 64, 1000L * (i % 10 + 1)))
    }.toDF("media_id", "content", "meta")
      .select(col("media_id"), col("content"),
        col("meta").cast(MEDIA_SCHEMA("meta").dataType).as("meta"))
  }

  // ------------------------------------------------------------------
  // Media dedup through the decode seam (VERDICT r7 #4): byte-exact on
  // the payload, feature-cosine via the decoded features — the same
  // exact / semantic / index-probe ladder the text side has, with the
  // codec as the only swap point.
  // ------------------------------------------------------------------

  /** Byte-exact media dedup — the A8 hash-groupBy on an opaque binary
    * column: payloads group on `(length, sha-256)` (the hash shuffles,
    * never the media bytes — at 100 TB the payloads stay where they
    * are), the minimum id per group is elected canonical. Null payloads
    * are their own singletons. Returns
    * `(media_id, canonical_id, is_dup)`, one row per input row. */
  def exactMediaDedup(df: DataFrame, contentCol: String,
                      idCol: String): DataFrame = {
    val keyed = df.select(col(idCol).as("media_id"),
      sha2(col(contentCol), 256).as("_h"),
      length(col(contentCol)).as("_len"))
    // the canonical election aggregates a RENAMED projection: an
    // aggregate's referenced attributes stay name-resolvable through
    // the join back (Spark hidden-column resolution), and a second
    // `media_id` in scope would poison the final select
    val canon = keyed.select(col("_h").as("_ch"), col("_len").as("_cl"),
        col("media_id").as("_cid"))
      .where(col("_ch").isNotNull)
      .groupBy(col("_ch"), col("_cl"))
      .agg(min(col("_cid")).as("canonical_id"))
    keyed.join(canon,
        col("_h") === col("_ch") && col("_len") === col("_cl"), "left")
      .select(col("media_id"),
        coalesce(col("canonical_id"), col("media_id")).as("canonical_id"),
        (col("media_id") =!=
          coalesce(col("canonical_id"), col("media_id"))).as("is_dup"))
  }

  /** Feature-cosine media near-dup: decode through the seam, then the
    * text side's bucketed [[Similarity.semanticDedup]] over the feature
    * vectors (k-means cells, per-cell representative cap — n·repCap dot
    * products, never all-pairs). Returns `(vec_id, cluster_id, keep)`.
    * The stub codec's features are hash-like (byte-exact twins only);
    * a perceptual codec behind the same seam makes this true visual
    * near-dup without touching the plumbing. */
  def mediaSemanticDedup(df: DataFrame, contentCol: String, idCol: String,
                         codec: Codec = StubCodec, k: Int = 8,
                         tau: Double = 0.4, repCap: Int = 64): DataFrame =
    Similarity.semanticDedup(withDecodedFeatures(df, contentCol, codec),
      "features", idCol, k, tau, repCap)

  /** Persist the decoded-feature IVF-PQ index of a media corpus — the
    * serving/incremental half: decode once, index the features with
    * [[Similarity.writeIvfPqIndex]] (partition-pruned probes, codegen
    * encode). `m` must divide the codec's `featureDim`. */
  def writeMediaFeatureIndex(df: DataFrame, contentCol: String, idCol: String,
                             path: String, codec: Codec = StubCodec,
                             nCells: Int = 8, m: Int = 8, ksub: Int = 16,
                             iters: Int = 2,
                             trainFraction: Double = 1.0): Unit =
    Similarity.writeIvfPqIndex(withDecodedFeatures(df, contentCol, codec),
      "features", idCol, path, nCells, m, ksub, iters, trainFraction)

  /** Probe a NEW media batch against the persisted feature index:
    * decode the batch through the same seam, then
    * [[Similarity.knnIvfPqBatch]] (one relational job for the whole
    * batch; the index scan prunes to nProbe cells per query). Rows with
    * `dist ≤ maxDist` are the near-dup hits — byte-exact twins land at
    * exactly 0 under any deterministic codec. Returns
    * `(query_id, vec_id, dist)` filtered to hits. */
  def mediaNearDupAgainstIndex(spark: SparkSession, path: String,
                               newDf: DataFrame, contentCol: String,
                               idCol: String, codec: Codec = StubCodec,
                               k: Int = 10, nProbe: Int = 4,
                               rerank: Int = 50,
                               maxDist: Double = 1e-6): DataFrame =
    Similarity.knnIvfPqBatch(spark, path,
        withDecodedFeatures(newDf, contentCol, codec), idCol, "features",
        k = k, nProbe = nProbe, rerank = rerank)
      .filter(col("dist") <= maxDist)
}
