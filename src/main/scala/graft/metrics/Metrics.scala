package graft.metrics

import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.{AtomicLong, LongAdder}

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Job-level observability — the engine's
  * `adi/app/ingestion_service/metrics.py:14-46` (Prometheus counters +
  * histograms per ingest domain, the `_IngestSpan` ok/no_data/error
  * protocol), re-expressed as a driver-side registry that exports in
  * the standard Prometheus TEXT EXPOSITION format (so a node_exporter
  * textfile collector or a pushgateway consumes it unchanged) and as a
  * DataFrame snapshot for the lake (the queryable complement — Spark's
  * own metrics system covers executor internals; this covers the
  * PIPELINE'S domain semantics: requests by status, rows written,
  * stage durations).
  *
  * Semantics mirror prometheus_client:
  *  - counters are monotone `LongAdder`s keyed by (name, sorted labels);
  *  - histograms keep CUMULATIVE bucket counts (`le` convention, +Inf
  *    implicit) plus `_sum`/`_count`, with the reference's API-work
  *    bucket ladder as the default;
  *  - [[ingestSpan]] defaults the status to "error" unless the body
  *    marks otherwise — a crash is never silently counted as ok
  *    (`metrics.py:31-46`).
  *
  * Registry is per-JVM (the driver — where the reference's process
  * lives); tests construct private instances. */
class Metrics {

  private val counters = new ConcurrentHashMap[(String, Seq[(String, String)]), LongAdder]()
  private val histograms = new ConcurrentHashMap[(String, Seq[(String, String)]), Histogram]()

  final class Histogram(val buckets: Seq[Double]) {
    val bucketCounts: Array[LongAdder] = Array.fill(buckets.size)(new LongAdder)
    val count = new LongAdder
    /** Sum in micro-units so it accumulates exactly (order-free). */
    val sumMicros = new AtomicLong(0L)
    def observe(seconds: Double): Unit = {
      var i = 0
      while (i < buckets.length) {
        if (seconds <= buckets(i)) bucketCounts(i).increment()
        i += 1
      }
      count.increment()
      sumMicros.addAndGet(math.round(seconds * 1e6))
    }
  }

  /** The reference's "reasonable buckets for API work". */
  val DefaultBuckets: Seq[Double] =
    Seq(0.02, 0.05, 0.1, 0.25, 0.5, 1, 2, 5, 10, 30)

  private def norm(labels: Map[String, String]): Seq[(String, String)] =
    labels.toSeq.sortBy(_._1)

  def counter(name: String, labels: Map[String, String] = Map.empty): LongAdder =
    counters.computeIfAbsent((name, norm(labels)), _ => new LongAdder)

  def histogram(name: String, labels: Map[String, String] = Map.empty,
                buckets: Seq[Double] = DefaultBuckets): Histogram = {
    val h = histograms.computeIfAbsent((name, norm(labels)),
      _ => new Histogram(buckets.sorted))
    // Prometheus semantics: one time series = one bucket ladder. A
    // second registration with a DIFFERENT ladder must fail loudly —
    // silently bucketing its observations on the first caller's ladder
    // would misrepresent the distribution in the exposition.
    require(h.buckets == buckets.sorted,
      s"histogram '$name'${norm(labels)} already registered with buckets " +
        s"${h.buckets.mkString(",")} — got ${buckets.sorted.mkString(",")}")
    h
  }

  /** `metrics.py` _IngestSpan: time the body, count
    * `ingest_requests_total{domain, status}` and
    * `ingest_duration_seconds{domain}`. Status defaults to "error" —
    * the body must call `setStatus("ok" | "no_data")` on success; an
    * exception both counts error and rethrows. `clock` is nanos,
    * injectable. */
  def ingestSpan[T](domain: String,
                    clock: () => Long = System.nanoTime)(
                    body: (String => Unit) => T): T = {
    val t0 = clock()
    var status = "error"
    try {
      val out = body(s => status = s)
      out
    } finally {
      counter("ingest_requests_total",
        Map("domain" -> domain, "status" -> status)).increment()
      histogram("ingest_duration_seconds", Map("domain" -> domain))
        .observe((clock() - t0) / 1e9)
    }
  }

  /** `FEATURE_ROWS_WRITTEN.labels(domain).inc(n)`. */
  def rowsWritten(domain: String, n: Long): Unit =
    counter("feature_rows_written_total", Map("domain" -> domain)).add(n)

  private def labelStr(labels: Seq[(String, String)], extra: Seq[(String, String)] = Nil): String = {
    val all = labels ++ extra
    // Prometheus label-value escaping: backslash, quote, newline — an
    // unescaped quote in a value corrupts the whole exposition
    def esc(v: String): String = v.flatMap {
      case '\\' => "\\\\"
      case '"' => "\\\""
      case '\n' => "\\n"
      case c => c.toString
    }
    if (all.isEmpty) ""
    else all.map { case (k, v) => s"""$k="${esc(v)}"""" }.mkString("{", ",", "}")
  }

  /** Prometheus text exposition format, deterministically ordered. */
  def exposition(): String = {
    import scala.jdk.CollectionConverters._
    val sb = new StringBuilder
    counters.asScala.toSeq.sortBy { case ((n, ls), _) => (n, ls.toString) }
      .foreach { case ((name, labels), v) =>
        sb.append(s"$name${labelStr(labels)} ${v.sum()}\n")
      }
    histograms.asScala.toSeq.sortBy { case ((n, ls), _) => (n, ls.toString) }
      .foreach { case ((name, labels), h) =>
        h.buckets.zipWithIndex.foreach { case (b, i) =>
          sb.append(s"${name}_bucket${labelStr(labels, Seq("le" -> b.toString))} ${h.bucketCounts(i).sum()}\n")
        }
        sb.append(s"${name}_bucket${labelStr(labels, Seq("le" -> "+Inf"))} ${h.count.sum()}\n")
        sb.append(s"${name}_sum${labelStr(labels)} ${h.sumMicros.get() / 1e6}\n")
        sb.append(s"${name}_count${labelStr(labels)} ${h.count.sum()}\n")
      }
    sb.toString
  }

  /** Lake-queryable snapshot: one row per exported sample
    * `(metric, labels, value)` — counters and the histogram
    * sum/count/bucket samples, same naming as [[exposition]]. */
  def snapshot(spark: SparkSession): DataFrame = {
    import scala.jdk.CollectionConverters._
    import spark.implicits._
    val rows = scala.collection.mutable.ArrayBuffer[(String, String, Double)]()
    counters.asScala.foreach { case ((name, labels), v) =>
      rows += ((name, labelStr(labels), v.sum().toDouble))
    }
    histograms.asScala.foreach { case ((name, labels), h) =>
      h.buckets.zipWithIndex.foreach { case (b, i) =>
        rows += ((s"${name}_bucket", labelStr(labels, Seq("le" -> b.toString)),
          h.bucketCounts(i).sum().toDouble))
      }
      rows += ((s"${name}_sum", labelStr(labels), h.sumMicros.get() / 1e6))
      rows += ((s"${name}_count", labelStr(labels), h.count.sum().toDouble))
    }
    rows.toSeq.toDF("metric", "labels", "value")
  }
}

/** The driver-global registry (the reference's module-level collectors). */
object Metrics extends Metrics
