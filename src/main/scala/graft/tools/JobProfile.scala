package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

/** Per-query Spark job/stage/task census under the honest noop sink —
  * answers "is this query's wall the plan or the scheduling floor?".
  * A query whose wall is mostly #jobs × ~50 ms driver-loop latency is
  * floor-bound: the fix is fewer sequential jobs, not a better plan.
  *
  * Usage: runMain graft.tools.JobProfile <q1> [q2 ...]
  *   SPARK_GRAFT_SF_DIR selects the scale (default sf0.1).
  * Prints one line per query: wall, jobs, stages, tasks, shuffle bytes.
  */
object JobProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize",
        sys.env.getOrElse("SPARK_GRAFT_MIN_PARTITION_SIZE", "64k")) // mirror Bench
      .config("spark.ui.enabled", "false")
    // A/B harness: SPARK_GRAFT_EXTRA_CONF="k=v;k=v" layers candidate
    // session confs over the bench baseline without editing Bench.scala
    sys.env.get("SPARK_GRAFT_EXTRA_CONF").foreach(_.split(";").foreach { kv =>
      val Array(k, v) = kv.split("=", 2)
      builder.config(k.trim, v.trim)
    })
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val jobs = new AtomicInteger(0)
    val stages = new AtomicInteger(0)
    val tasks = new AtomicInteger(0)
    val shuffleRead = new AtomicLong(0L)
    val listener = new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = jobs.incrementAndGet()
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit =
        stages.incrementAndGet()
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        tasks.incrementAndGet()
        if (t.taskMetrics != null)
          shuffleRead.addAndGet(t.taskMetrics.shuffleReadMetrics.totalBytesRead)
      }
    }
    spark.sparkContext.addSparkListener(listener)
    args.foreach { name =>
      val fn = graft.SparkEntry.queries.getOrElse(name,
        sys.error(s"unknown query $name"))
      // warm pass (codegen/JIT) then the measured pass, mirroring the
      // bench's best-of-N which reports warm-plan walls
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      spark.catalog.clearCache()
      Thread.sleep(300) // drain the async listener bus between passes
      jobs.set(0); stages.set(0); tasks.set(0); shuffleRead.set(0L)
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      val sec = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300)
      println(f"[jobprofile] $name wall=$sec%.2fs jobs=${jobs.get} " +
        f"stages=${stages.get} tasks=${tasks.get} " +
        f"shuffleReadMB=${shuffleRead.get / 1048576.0}%.1f")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
