package graft.operators

/** Pluggable inference-backend contract for the two model stages (U3
  * sentiment — `adi/app/ingestion_service/ml_utils.py:16-68`; U4
  * embeddings — `adi/app/features/processors/nlp_embeddings.py:6-36`).
  *
  * The reference holds its transformers pipeline in a process-global
  * singleton (`ml_utils._PIPELINE`) so the model loads once per worker
  * process. The Spark equivalent needs one more rule, because the object
  * that reaches the executor travels through the CLOSURE SERIALIZER:
  *
  *  - what SERIALIZES is cheap config only (model path, dim, batch
  *    size) — a real runtime session (ONNX, JNI, native buffers) is not
  *    serializable and must never be touched on the driver;
  *  - the heavy runtime is built LAZILY on first use inside the
  *    executor, and cached PER JVM keyed by config ([[InferenceRuntimeCache]])
  *    — `@transient lazy` alone is per-deserialized-instance, and every
  *    task deserializes its own copy, so without the JVM cache an
  *    executor would load the model once per task instead of once;
  *  - teardown rides executor JVM exit (sessions are reused for the
  *    process lifetime, exactly like the reference's singleton).
  *
  * A production deployment implements [[LazyRuntime.loadRuntime]] with
  * its ONNX/JNI session build and ships the subclass into the existing
  * batched-`mapPartitions` stages ([[SentimentScorer.withSentiment]],
  * [[TextEmbeddings.withEmbeddings]]) unchanged. The contract — driver
  * never builds, one build per JVM, serialization survives a built
  * runtime — is pinned by the backend contract spec. */
object InferenceRuntimeCache {
  private val cache = new java.util.concurrent.ConcurrentHashMap[Any, AnyRef]()

  /** One runtime per (JVM, key): the first caller builds, everyone else
    * (other tasks, other partitions, re-deserialized backend copies)
    * reuses. `computeIfAbsent` makes the build atomic per key. */
  def getOrCreate[R <: AnyRef](key: Any)(build: => R): R =
    cache.computeIfAbsent(key, _ => build).asInstanceOf[R]

  /** Visible for tests: drop every cached runtime. */
  private[graft] def clear(): Unit = cache.clear()
}

/** Mix-in giving a serializable backend facade its executor-local heavy
  * runtime. Subclasses define the serializable config (constructor
  * fields), a stable [[runtimeKey]] (defaults should be the config), and
  * [[loadRuntime]]; they call [[runtime]] from their per-batch methods. */
trait LazyRuntime[R <: AnyRef] extends Serializable {
  /** Cache key: backends constructed from equal config share one runtime
    * per JVM. Must be stable across serialization round-trips (use case
    * classes / primitives). */
  protected def runtimeKey: Any

  /** Build the heavy runtime — executes on the EXECUTOR at first use,
    * never at construction or serialization time. */
  protected def loadRuntime(): R

  @transient private lazy val rt: R =
    InferenceRuntimeCache.getOrCreate(runtimeKey)(loadRuntime())

  /** The per-JVM runtime instance (builds it on first call). */
  protected final def runtime: R = rt
}

/** What a sentiment runtime must provide — deliberately NOT
  * `Serializable`: a real session cannot ship, only its config can. */
trait SentimentRuntime {
  /** One vectorized call per batch: (p_pos, p_neg) per text. */
  def scoreBatch(texts: Seq[String]): Seq[(Double, Double)]
}

/** What an embedding runtime must provide — deliberately NOT
  * `Serializable`. */
trait EmbeddingRuntime {
  def encodeBatch(texts: Seq[String]): Seq[Array[Float]]
}

/** Serializable facade wiring a [[SentimentRuntime]] into the existing
  * [[SentimentScorer.Model]] seam: subclass with config fields +
  * `loadRuntime`, pass to [[SentimentScorer.withSentiment]]. */
abstract class RuntimeSentimentModel extends SentimentScorer.Model
    with LazyRuntime[SentimentRuntime] {
  final def predict(texts: Seq[String]): Seq[(Double, Double)] =
    runtime.scoreBatch(texts)
}

/** Serializable facade wiring an [[EmbeddingRuntime]] into the existing
  * [[TextEmbeddings.Encoder]] seam. `dim` must come from config, not the
  * runtime — it is read where the runtime may not exist (driver-side
  * schema decisions). */
abstract class RuntimeEncoder extends TextEmbeddings.Encoder
    with LazyRuntime[EmbeddingRuntime] {
  final def encode(texts: Seq[String]): Seq[Array[Float]] =
    runtime.encodeBatch(texts)
}
