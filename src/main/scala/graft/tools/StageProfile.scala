package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

import scala.collection.mutable.ArrayBuffer

/** Per-stage census under the honest noop sink — where JobProfile says
  * "plan-bound, not floor-bound", this says WHICH stage. Prints the
  * top stages by wall with task counts and I/O.
  *
  * Usage: runMain graft.tools.StageProfile <q1> [q2 ...]
  *   SPARK_GRAFT_SF_DIR selects the scale (default sf0.1);
  *   SPARK_GRAFT_EXTRA_CONF layers A/B confs like JobProfile.
  */
object StageProfile {
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
    sys.env.get("SPARK_GRAFT_EXTRA_CONF").foreach(_.split(";").foreach { kv =>
      val Array(k, v) = kv.split("=", 2)
      builder.config(k.trim, v.trim)
    })
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    case class St(id: Int, name: String, wallMs: Long, tasks: Int,
                  inMB: Double, shufReadMB: Double, shufWriteMB: Double,
                  cpuMs: Long)
    val stages = ArrayBuffer.empty[St]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        val i = s.stageInfo
        val wall = (for {a <- i.submissionTime; b <- i.completionTime}
          yield b - a).getOrElse(-1L)
        val m = i.taskMetrics
        stages.synchronized {
          stages += St(i.stageId, i.name.takeWhile(_ != '\n').take(60), wall,
            i.numTasks, m.inputMetrics.bytesRead / 1048576.0,
            m.shuffleReadMetrics.totalBytesRead / 1048576.0,
            m.shuffleWriteMetrics.bytesWritten / 1048576.0,
            m.executorCpuTime / 1000000L)
        }
      }
    })
    args.foreach { name =>
      val fn = graft.SparkEntry.queries.getOrElse(name,
        sys.error(s"unknown query $name"))
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      spark.catalog.clearCache()
      Thread.sleep(300)
      stages.synchronized(stages.clear())
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      val sec = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300)
      val snap = stages.synchronized(stages.toList)
      println(f"[stageprofile] $name wall=$sec%.2fs stages=${snap.size} " +
        f"stageWallSum=${snap.map(_.wallMs).sum / 1000.0}%.2fs")
      snap.sortBy(-_.wallMs).take(12).foreach { s =>
        println(f"[stageprofile]   id=${s.id}%4d ${s.wallMs}%6dms tasks=${s.tasks}%4d " +
          f"cpu=${s.cpuMs}%6dms in=${s.inMB}%7.1fMB sr=${s.shufReadMB}%6.1fMB " +
          f"sw=${s.shufWriteMB}%6.1fMB ${s.name}")
      }
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
