package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main. Runs every `SparkEntry.queries` entry against
  * `SPARK_GRAFT_SF_DIR` and prints ONE JSON line with per-query seconds.
  *
  * Trust mechanisms (round-1 verdict asked for falsifiable numbers):
  *   - best-of-N timing (`SPARK_GRAFT_BENCH_REPS`, default 3), with the
  *     reps taken as FULL PASSES over the suite rather than back-to-back:
  *     host-noise windows on this box last minutes and degrade whole
  *     stretches of a run (measured: the same query 2.3 s in a fresh JVM
  *     vs 47–184 s inside a degraded window, at near-zero steal), so
  *     adjacent reps would both land in the same window while pass-spaced
  *     reps don't;
  *   - per-rep host CPU-steal deltas from `/proc/stat` (cpu field 8) and
  *     CPU pressure-stall deltas from `/proc/pressure/cpu` (`some total`
  *     µs): a number with near-zero steal+PSI is a clean measurement.
  * JSON: `queries` (best sec), `steal_jiffies`/`psi_cpu_us` (best rep's
  * deltas), `reps` ([sec, steal, psi_us] per pass), `steal_total`.
  */
object Bench {

  /** Cumulative steal jiffies — `/proc/stat` aggregate cpu line, field 8.
    * -1 if unreadable. Shared with the graft.tools profilers so the parse
    * (and its short-line guard) can't drift between copies. */
  private[graft] def stealJiffies(): Long =
    try {
      val src = scala.io.Source.fromFile("/proc/stat")
      try src.getLines().find(_.startsWith("cpu ")) match {
        case Some(line) =>
          val f = line.trim.split("\\s+")
          if (f.length > 8) f(8).toLong else 0L
        case None => -1L
      } finally src.close()
    } catch { case _: Throwable => -1L }

  /** Cumulative CPU pressure-stall µs — `/proc/pressure/cpu`, `some
    * total=` field. Catches host noise that steal accounting misses. */
  private def psiCpuUs(): Long =
    try {
      val src = scala.io.Source.fromFile("/proc/pressure/cpu")
      try src.getLines().find(_.startsWith("some")) match {
        case Some(line) =>
          "total=(\\d+)".r.findFirstMatchIn(line).map(_.group(1).toLong).getOrElse(-1L)
        case None => -1L
      } finally src.close()
    } catch { case _: Throwable => -1L }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // 3 pass-spaced reps: degradation windows last minutes, so two passes
    // can both straddle one window; a third ~30 s clean pass is cheap
    // insurance that best-of-N reflects the plan, not the host
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt.max(1)
    // AQE's partition coalescing is size-targeted (default floor 1 MB /
    // advisory 64 MB), which at small scale collapses CPU-BOUND stages
    // (text kernels, per-window ladders) onto 1-4 tasks while the other
    // cores idle — measured r13: q_sadf 3.9→2.7 s, q_trend_scan 3.3→2.1,
    // q_bet_size 2.5→1.5, q_embed_neardup_lsh 4.9→2.2 just from a 64 KB
    // floor. At production partition sizes (100s of MB) a 64 KB floor is
    // inert — this is parallelism insurance for compute-dense stages, not
    // a local[32] constant (override via SPARK_GRAFT_MIN_PARTITION_SIZE).
    val minPart = sys.env.getOrElse("SPARK_GRAFT_MIN_PARTITION_SIZE", "64k")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize", minPart)
      // same session semantics Verify green-lights: timing a query that
      // computes different rows than the verified one would be meaningless
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    import org.apache.spark.sql.functions.{col => c, sum => fsum}
    /** Fixed CPU-bound probe with a constant cost (~0.2 s clean): its
      * wall time is a machine-health index that needs no host metrics.
      * Degradation windows here slow the guest 10–50× while steal AND
      * /proc/pressure stay near zero (hypervisor throttling is invisible
      * from inside) — a slow probe next to a slow query says "machine".
      * ONE-SIDED: a fast probe does NOT clear a multi-stage query, since
      * the noise mode stretches inter-stage gaps that one dense stage
      * never sees (see BASELINE.md). Warmed once so JIT isn't measured. */
    def calibrate(): Double = {
      val t0 = System.nanoTime()
      spark.range(50000000L).select(fsum(c("id") % 7L)).head()
      (System.nanoTime() - t0) / 1e9
    }
    calibrate() // JIT/codegen warm-up for the probe itself

    val stealStart = stealJiffies()
    val names = SparkEntry.queries.keys.toSeq
    val runs = scala.collection.mutable.Map.empty[String, List[(Double, Long, Long, Double)]]
      .withDefaultValue(Nil)
    val errors = scala.collection.mutable.Map.empty[String, String]
    (1 to reps).foreach { pass =>
      SparkEntry.queries.foreach { case (name, fn) =>
        val calib = calibrate()
        val s0 = stealJiffies()
        val p0 = psiCpuUs()
        val t0 = System.nanoTime()
        var failed = false
        // HONEST materialization: the noop sink consumes EVERY output
        // column, so column pruning can't hollow the plan out. Round 7
        // caught `.count()` letting Catalyst eliminate whole join
        // pipelines — q_triple_barrier "ran" in 0.1 s while its band
        // join (the entire query) was optimized away; the honest cost
        // was 104 s pre-fix. count() benches the scan, not the query.
        try {
          fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        } catch { case e: Throwable =>
          failed = true
          errors(name) = e.toString.replaceAll("[\"\\\\\\p{Cntrl}]", " ").take(200)
          System.err.println(s"[bench] $name FAILED: ${e.getMessage}") }
        val sec = (System.nanoTime() - t0) / 1e9
        // isolate queries: drop persisted frames some operators pin
        spark.catalog.clearCache()
        // a failing rep must never enter best-of-N — a quickly-crashing
        // query would otherwise "improve" the suite total
        if (!failed)
          runs(name) = runs(name) :+ ((sec, stealJiffies() - s0, psiCpuUs() - p0, calib))
        System.err.println(f"[bench] pass$pass $name $sec%.1fs " +
          f"(steal ${stealJiffies() - s0} jf, calib $calib%.2fs)" +
          (if (failed) " FAILED" else ""))
      }
    }
    def jmap(kv: Iterable[(String, String)]): String =
      kv.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    val ok = names.filter(runs(_).nonEmpty)
    val best = ok.map(n => n -> runs(n).minBy(_._1)).toMap
    val qs = jmap(ok.map(n => n -> best(n)._1.toString))
    val steal = jmap(ok.map(n => n -> best(n)._2.toString))
    val psi = jmap(ok.map(n => n -> best(n)._3.toString))
    val calib = jmap(ok.map(n => n -> best(n)._4.toString))
    val repsJson = jmap(ok.map(n =>
      n -> runs(n).map { case (s, j, p, cal) => s"[$s,$j,$p,$cal]" }
        .mkString("[", ",", "]")))
    val errJson = jmap(errors.toSeq.sortBy(_._1)
      .map { case (n, m) => n -> ("\"" + m + "\"") })
    // a query failing EVERY rep leaves `queries`, which would shrink
    // `value` and read as a speedup — flag it front and center
    val allFailed = names.filterNot(ok.contains)
    val failedJson = allFailed.sorted.map("\"" + _ + "\"").mkString("[", ",", "]")
    val total = ok.map(best(_)._1).sum
    val json = s"""{"metric":"total","value":$total,"unit":"sec",""" +
      s""""failed_queries":$failedJson,"queries":$qs,""" +
      s""""steal_jiffies":$steal,"psi_cpu_us":$psi,"calib_sec":$calib,""" +
      s""""reps":$repsJson,"errors":$errJson,""" +
      s""""steal_total":${stealJiffies() - stealStart},""" +
      s""""n_reps":$reps,"sf":"$sfDir"}"""
    // stdout goes through sbt's logger, which prefixes `[info] ` — every
    // BENCH_r*.json artifact through round 6 ended `"parsed": null` because
    // of it. The file is the machine-readable record; stdout stays for eyes.
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_out.json")
    try {
      val w = new java.io.PrintWriter(new java.io.File(outPath), "UTF-8")
      try w.println(json) finally w.close()
      System.err.println(s"[bench] wrote $outPath")
    } catch { case e: Throwable =>
      System.err.println(s"[bench] could not write $outPath: $e") }
    println(json)
    spark.stop()
  }
}
