package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** A LEARNED sentiment backend — the first real model behind the
  * inference seam (the reference's DistilBERT SST-2 pipeline,
  * `adi/app/ingestion_service/ml_utils.py:16-68`, needs downloaded
  * weights this environment cannot fetch; a hashing-trick logistic
  * regression trains offline from labeled data and exercises every part
  * of the production path: train on the cluster → export plain weights →
  * ship serializable config → build the scoring runtime once per
  * executor JVM → batched `mapPartitions` scoring).
  *
  * Train-time featurization is a UDF on purpose: training is a one-off
  * driver-coordinated MLlib fit, not a data-plane hot path. INFERENCE
  * carries no MLlib at all — the exported model is a weight array and a
  * hash function, so the scoring stage stays the same vectorized
  * mapPartitions batch loop as every other backend.
  *
  * Swap-in contract: [[LogisticSentimentModel]] is a
  * [[RuntimeSentimentModel]], so `SentimentScorer.withSentiment(df,
  * "text", model)` works unchanged, and the per-JVM runtime-cache
  * guarantees (BackendContractSpec) apply to it. */
object TrainedSentiment {
  val DefaultDim = 4096

  /** Lowercased whitespace tokens — String.hashCode is spec-stable
    * across JVMs, so train- and inference-side indexes always agree. */
  private[operators] def tokensOf(text: String): Array[String] =
    text.toLowerCase.split("\\s+").filter(_.nonEmpty)

  private[operators] def indexOf(tok: String, dim: Int): Int =
    math.floorMod(tok.hashCode, dim)

  private[operators] def featurize(text: String, dim: Int): org.apache.spark.ml.linalg.Vector = {
    val m = scala.collection.mutable.HashMap.empty[Int, Double]
    tokensOf(text).foreach { t =>
      val i = indexOf(t, dim)
      m(i) = m.getOrElse(i, 0.0) + 1.0
    }
    org.apache.spark.ml.linalg.Vectors.sparse(dim, m.toSeq.sortBy(_._1))
  }

  /** Fit a logistic regression on `(textCol, labelCol)` rows (label 1.0 =
    * positive, 0.0 = negative) and export it as a serializable
    * weights-only model. Distributed training (MLlib LBFGS), constant-
    * size output: `dim` weights + intercept. */
  def train(df: DataFrame, textCol: String, labelCol: String,
            dim: Int = DefaultDim, maxIter: Int = 50,
            regParam: Double = 1e-3): LogisticSentimentModel = {
    require(dim > 0, s"dim must be positive, got $dim")
    val fz = udf((s: String) => featurize(if (s == null) "" else s, dim))
    val data = df.select(col(labelCol).cast("double").as("label"),
      fz(col(textCol)).as("features"))
    val lr = new org.apache.spark.ml.classification.LogisticRegression()
      .setMaxIter(maxIter).setRegParam(regParam)
    val fit = lr.fit(data)
    LogisticSentimentModel(fit.coefficients.toArray.toVector, fit.intercept, dim)
  }
}

/** Exported learned model: weights are the serializable config (a
  * `scala.Vector` so equality/hashCode are structural — the per-JVM
  * runtime cache key must survive serialization round-trips), the
  * scoring closure is the runtime built once per executor JVM. */
final case class LogisticSentimentModel(weights: Vector[Double],
                                        intercept: Double, dim: Int)
    extends RuntimeSentimentModel {
  require(weights.length == dim, s"got ${weights.length} weights for dim=$dim")

  override protected def runtimeKey: Any = (weights, intercept, dim)

  override protected def loadRuntime(): SentimentRuntime = {
    val w = weights.toArray // unbox once per JVM, not per batch
    val b = intercept
    val d = dim
    new SentimentRuntime {
      def scoreBatch(texts: Seq[String]): Seq[(Double, Double)] = texts.map { t =>
        var z = b
        val toks = TrainedSentiment.tokensOf(if (t == null) "" else t)
        var i = 0
        while (i < toks.length) {
          z += w(TrainedSentiment.indexOf(toks(i), d))
          i += 1
        }
        val p = 1.0 / (1.0 + math.exp(-z))
        (p, 1.0 - p)
      }
    }
  }
}
