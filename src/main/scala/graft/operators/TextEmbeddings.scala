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

  /** Model-free REAL embedder — hashing + dense random projection
    * (Johnson–Lindenstrauss): tokens tf-hash into `vocabDim` buckets
    * (few collisions, unlike [[HashingEncoder]]'s direct `dim` buckets),
    * then project through a fixed md5-derived matrix to `dim` and L2
    * normalize. Cosine between encodings approximates token-overlap
    * cosine with JL distortion — enough to drive the ANN / semantic-
    * dedup operators with meaningful geometry, deterministically, with
    * zero model weights to download.
    *
    * The `dim×vocabDim` projection (~2 MB at defaults) is the HEAVY
    * runtime: built lazily once per executor JVM through the
    * [[LazyRuntime]] contract; only `(dim, vocabDim)` serialize. */
  final case class RandomProjectionEncoder(dim: Int = 64, vocabDim: Int = 4096)
      extends RuntimeEncoder {
    require(dim > 0 && vocabDim >= dim, s"need vocabDim >= dim > 0, got $dim/$vocabDim")

    override protected def runtimeKey: Any = ("rproj", dim, vocabDim)

    override protected def loadRuntime(): EmbeddingRuntime = {
      // row-major [dim][vocabDim], entries in [-1, 1] from the same
      // md5 generator as the LSH hyperplanes (well-mixed, portable)
      val proj = Array.tabulate(dim)(d =>
        Array.tabulate(vocabDim)(v => Similarity.planeWeight(1 << 20 | d, v, 0)))
      val vDim = vocabDim
      val oDim = dim
      new EmbeddingRuntime {
        def encodeBatch(texts: Seq[String]): Seq[Array[Float]] = texts.map { t =>
          val counts = new scala.collection.mutable.HashMap[Int, Double]()
          t.toLowerCase.split("\\s+").filter(_.nonEmpty).foreach { tok =>
            val i = math.floorMod(
              scala.util.hashing.MurmurHash3.stringHash(tok, 42), vDim)
            counts(i) = counts.getOrElse(i, 0.0) + 1.0
          }
          val y = new Array[Double](oDim)
          counts.foreach { case (i, c) =>
            var d = 0
            while (d < oDim) { y(d) += proj(d)(i) * c; d += 1 }
          }
          val n = math.sqrt(y.map(x => x * x).sum)
          if (n > 0) y.map(x => (x / n).toFloat) else new Array[Float](oDim)
        }
      }
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
