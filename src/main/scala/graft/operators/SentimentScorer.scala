package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Sentiment-inference stage (U3) — the engine's
  * `adi/app/ingestion_service/ml_utils.py:16-68` (DistilBERT SST-2
  * pipeline, `return_all_scores=True`, called per tweet batch from
  * `adi/app/adapters/sentiment_adapter.py:132`), as a batched
  * per-partition map: model constructed once per partition (the
  * reference's process-global `_PIPELINE` singleton becomes
  * executor-local state), texts fed in `batchSize` groups — the shape a
  * transformers/ONNX backend needs.
  *
  * The model itself is STUBBED (no model runtime in this container):
  * [[LexiconStub]] is a deterministic smoothed-lexicon classifier, real
  * enough to drive every downstream consumer (signed score, 3-class
  * label, social ingest) and simple enough for an exact DuckDB oracle; a
  * production deployment swaps in a JNI/ONNX classifier without touching
  * the plumbing. Downstream normalization —
  * `score_signed = clamp(p_pos − p_neg)`, 0.4/0.6 label margins —
  * mirrors `ml_utils.py:34-54` exactly.
  */
object SentimentScorer {

  /** Binary sentiment model: one vectorized call per batch, returning
    * (p_pos, p_neg) per text with p_pos + p_neg = 1. */
  trait Model extends Serializable {
    def predict(texts: Seq[String]): Seq[(Double, Double)]
  }

  /** Deterministic stub (see object doc): Laplace-smoothed lexicon vote,
    * p_pos = (1 + #pos) / (2 + #pos + #neg) over whitespace tokens.
    * The lexicon deliberately includes testdata-vocabulary words
    * (fast/slow/big/small) so synthetic corpora exercise all three
    * labels instead of collapsing to neutral. */
  case object LexiconStub extends Model {
    val positive: Set[String] =
      Set("good", "great", "bull", "bullish", "gain", "up", "win", "moon",
        "fast", "big")
    val negative: Set[String] =
      Set("bad", "terrible", "bear", "bearish", "loss", "down", "fear",
        "crash", "slow", "small")
    def predict(texts: Seq[String]): Seq[(Double, Double)] = texts.map { t =>
      val toks = t.toLowerCase.trim.split("\\s+")
      val np = toks.count(positive)
      val nn = toks.count(negative)
      val pPos = (1.0 + np) / (2.0 + np + nn)
      (pPos, 1.0 - pPos)
    }
  }

  /** U3 normalization: signed score in [-1, 1]
    * (`ml_utils.py:45` — p_pos + p_neg ≈ 1, clamp for safety). */
  def sentimentSigned(pPos: Column, pNeg: Column): Column =
    greatest(lit(-1.0), least(lit(1.0), pPos - pNeg))

  /** U3 3-class label at the 0.4/0.6 margins (`ml_utils.py:46-51`). */
  def sentimentLabel(pPos: Column): Column =
    when(pPos >= 0.6, "positive").when(pPos <= 0.4, "negative").otherwise("neutral")

  /** texts → `p_pos`, `p_neg`, `sentiment_score` (signed),
    * `sentiment_label` via batched mapPartitions. Null texts score as
    * empty strings (the reference scores `""` rather than dropping the
    * tweet — `sentiment_adapter.py:130-137` defaults score to 0). */
  def withSentiment(df: DataFrame, textCol: String, model: Model,
                    batchSize: Int = 64): DataFrame = {
    val outSchema = StructType(df.schema.fields ++ Seq(
      StructField("p_pos", DoubleType, nullable = false),
      StructField("p_neg", DoubleType, nullable = false)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(outSchema)
    val idx = df.schema.fieldIndex(textCol)
    df.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        val ps = model.predict(batch.map(r => Option(r.getString(idx)).getOrElse("")))
        batch.zip(ps).map { case (r, (pp, pn)) => Row.fromSeq(r.toSeq :+ pp :+ pn) }
      }
    }(enc)
      .withColumn("sentiment_score", sentimentSigned(col("p_pos"), col("p_neg")))
      .withColumn("sentiment_label", sentimentLabel(col("p_pos")))
  }
}
