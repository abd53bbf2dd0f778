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
    * bytes derived from the id). */
  def syntheticMedia(spark: SparkSession, n: Int): DataFrame = {
    import spark.implicits._
    spark.range(n.toLong).map { i =>
      val bytes = Array.tabulate[Byte](64)(j => ((i * 31 + j) % 127).toByte)
      (i, bytes, ("img", 64, 64, 1000L * (i % 10 + 1)))
    }.toDF("media_id", "content", "meta")
      .select(col("media_id"), col("content"),
        col("meta").cast(MEDIA_SCHEMA("meta").dataType).as("meta"))
  }
}
