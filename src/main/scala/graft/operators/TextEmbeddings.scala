package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._

/** Text-embedding stage (U4) — the engine's
  * `adi/app/features/processors/nlp_embeddings.py:6-36`
  * (sentence-transformers MiniLM → 384-dim columns), as a batched
  * per-partition map: encoder constructed once per partition, texts fed in
  * `batchSize` groups (the shape a vectorized/ONNX backend needs), output
  * an `ArrayType(FloatType)` column (kept as an array, not exploded cols —
  * the columnar layout the similarity/dedup operators consume).
  *
  * The encoder itself is STUBBED (no model runtime in this container):
  * [[HashingEncoder]] is a deterministic feature-hashing embedder, real
  * enough to drive the ANN/dedup operators end-to-end in tests; a
  * production deployment swaps in a JNI/ONNX encoder without touching the
  * plumbing.
  */
object TextEmbeddings {

  trait Encoder extends Serializable {
    def dim: Int
    /** One vectorized call per batch — implementations may pad/truncate. */
    def encode(texts: Seq[String]): Seq[Array[Float]]
  }

  /** Deterministic feature-hashing embedder (STUB — see object doc):
    * token hashed into `dim` buckets, ±1 by a second hash bit, L2-ish
    * scaled by token count. */
  case class HashingEncoder(dim: Int = 64) extends Encoder {
    def encode(texts: Seq[String]): Seq[Array[Float]] = texts.map { t =>
      val out = new Array[Float](dim)
      val toks = t.trim.split("\\s+")
      toks.foreach { tok =>
        val h = scala.util.hashing.MurmurHash3.stringHash(tok, 42)
        val idx = math.floorMod(h, dim)
        out(idx) += (if (((h >>> 16) & 1) == 0) 1.0f else -1.0f)
      }
      val n = math.sqrt(out.map(x => x.toDouble * x).sum)
      if (n > 0) out.map(x => (x / n).toFloat) else out
    }
  }

  /** texts → `embedding: array<float>` via batched mapPartitions. */
  def withEmbeddings(df: DataFrame, textCol: String, encoder: Encoder,
                     batchSize: Int = 64): DataFrame = {
    val outSchema = StructType(df.schema.fields :+
      StructField("embedding", ArrayType(FloatType)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(outSchema)
    val idx = df.schema.fieldIndex(textCol)
    df.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        val vecs = encoder.encode(batch.map(r => Option(r.getString(idx)).getOrElse("")))
        batch.zip(vecs).map { case (r, v) => Row.fromSeq(r.toSeq :+ v.toSeq) }
      }
    }(enc)
  }
}
