package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column handling (SURVEY §7 M9): image/audio/video as opaque
  * `binary` columns + typed metadata, with decode / feature-extract /
  * frame-sample as batched per-partition stages.
  *
  * The Spark-side plumbing — schema, batch shape, partition-parallel
  * execution, deterministic output contract — is real and tested. Two
  * codec tiers behind one seam:
  *  - [[PerceptualCodec]] / [[dHash64]] are REAL (pure JVM): a
  *    difference hash over a self-describing raw-grayscale payload, so
  *    recompressed/rescaled copies dedup as true visual near-dups.
  *  - Compressed-format decode (JPEG/PNG/audio) is STUBBED (this
  *    container ships no image/audio libs): [[StubCodec]] derives
  *    deterministic pseudo-features from the bytes. A production
  *    deployment swaps in a JNI/ONNX decoder that produces the raw
  *    grayscale form — everything downstream is unchanged.
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

  // ------------------------------------------------------------------
  // Perceptual path (VERDICT r8 #7): a REAL difference-hash over a
  // self-describing raw-grayscale payload — no model weights, no native
  // libs, pure JVM — so recompressed/rescaled/brightness-shifted copies
  // of the same image dedup as TRUE visual near-dups, not byte twins.
  // Payload format `[w:u16BE][h:u16BE][w·h gray bytes]`; compressed
  // formats (JPEG/PNG decode) remain the documented codec swap point —
  // they decode TO this raw form and reuse everything below unchanged.
  // ------------------------------------------------------------------

  /** Parse the raw-gray payload; None on null/truncated/malformed. */
  private def parseRawGray(b: Array[Byte]): Option[(Int, Int)] = {
    if (b == null || b.length < 4) return None
    val w = ((b(0) & 0xff) << 8) | (b(1) & 0xff)
    val h = ((b(2) & 0xff) << 8) | (b(3) & 0xff)
    if (w <= 0 || h <= 0 || b.length < 4 + w * h) None else Some((w, h))
  }

  /** Area-average resample of the raw-gray payload to `tw × th`. */
  private def resample(b: Array[Byte], w: Int, h: Int,
                       tw: Int, th: Int): Array[Double] = {
    val out = new Array[Double](tw * th)
    var cy = 0
    while (cy < th) {
      val y0 = cy * h / th; val y1 = math.max((cy + 1) * h / th, y0 + 1)
      var cx = 0
      while (cx < tw) {
        val x0 = cx * w / tw; val x1 = math.max((cx + 1) * w / tw, x0 + 1)
        var s = 0L; var n = 0; var y = y0
        while (y < y1) {
          var x = x0
          while (x < x1) { s += b(4 + y * w + x) & 0xff; n += 1; x += 1 }
          y += 1
        }
        out(cy * tw + cx) = s.toDouble / n
        cx += 1
      }
      cy += 1
    }
    out
  }

  /** 64-bit difference hash (dHash): area-average to a 9×8 grid, bit k
    * set iff cell (r, c) is brighter than its right neighbor. Invariant
    * under any monotone brightness shift and stable under rescaling /
    * mild recompression noise (the gradient-sign structure survives
    * both) — the standard no-weights perceptual fingerprint. Null on an
    * unparseable payload. */
  def dHash64(content: Array[Byte]): java.lang.Long = parseRawGray(content) match {
    case None => null
    case Some((w, h)) =>
      val g = resample(content, w, h, 9, 8)
      var hash = 0L; var k = 0; var r = 0
      while (r < 8) {
        var c = 0
        while (c < 8) {
          if (g(r * 9 + c) > g(r * 9 + c + 1)) hash |= (1L << k)
          k += 1; c += 1
        }
        r += 1
      }
      hash
  }

  /** Perceptual codec through the SAME [[Codec]] seam: the dHash bits
    * as a 64-dim 0/1 float vector, so the semantic-dedup / IVF-PQ
    * ladder runs unchanged on perceptual features (squared L2 between
    * two vectors = their Hamming distance). */
  object PerceptualCodec extends Codec {
    val featureDim = 64
    def decodeFeatures(content: Array[Byte]): Array[Float] = {
      val h = dHash64(content)
      if (h == null) null
      else Array.tabulate(64)(k => ((h >>> k) & 1L).toFloat)
    }
  }

  /** Annotate each row with its perceptual hash (`phash64: long`, null
    * on unparseable payloads) — the same batched per-partition stage
    * shape as [[withDecodedFeatures]]. */
  def withPerceptualHash(df: DataFrame, contentCol: String): DataFrame = {
    val outSchema = StructType(df.schema.fields :+
      StructField("phash64", LongType))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(outSchema)
    val idx = df.schema.fieldIndex(contentCol)
    df.mapPartitions { rows =>
      rows.map { r =>
        Row.fromSeq(r.toSeq :+ dHash64(r.getAs[Array[Byte]](idx)))
      }
    }(enc)
  }

  /** TRUE visual near-dup pairs: dHash per payload, then the exact
    * Hamming-ball join via [[Dedup.hammingNearDupPairs]]' Manku
    * combination blocking — the same machinery as text SimHash, fed by
    * the perceptual fingerprint. Recompressed / rescaled / brightness-
    * shifted copies land within `maxHamming`; unparseable payloads drop
    * (they still dedup byte-exactly via [[exactMediaDedup]], which is
    * unchanged by this path). Returns `(id_a, id_b, hamming)`. */
  def perceptualMediaDedup(df: DataFrame, contentCol: String, idCol: String,
                           maxHamming: Int = 3, blocks: Int = 6,
                           maxBucketSize: Int = 1000): DataFrame =
    Dedup.hammingNearDupPairs(
      withPerceptualHash(df.select(col(idCol), col(contentCol)), contentCol)
        .select(col(idCol).as("id"), col("phash64").as("sh"))
        .where(col("sh").isNotNull),
      maxHamming, blocks, maxBucketSize)

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
