package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Long-axis rehearsal for the QUADRATIC-by-contract pair operators
  * ([[graft.operators.Relational.mannKendall]] /
  * [[graft.operators.Relational.sampleEntropy]]) — the DfaRehearsal
  * doctrine: measure the cost curve, don't assume it. Drives both at
  * increasing per-key bucket counts on a deterministic synthetic
  * panel, records walls and the recovered statistics (a trend tape
  * must keep z ≫ 0 and Theil–Sen ≈ its slope at every length), and
  * proves the loud `maxBuckets` guard actually trips one step past
  * the documented budget.
  *
  * `runMain graft.tools.PairwiseRehearsal [buckets]` — default
  * 150,1500,4096 (sf0.1's daily span, a decade up, and the default
  * budget ceiling).
  */
object PairwiseRehearsal {
  private def time[A](f: => A): (A, Double) = {
    val t0 = System.nanoTime(); val a = f
    (a, (System.nanoTime() - t0) / 1e9)
  }

  def main(args: Array[String]): Unit = {
    val ns = if (args.nonEmpty) args(0).split(",").map(_.trim.toInt).toSeq
             else Seq(150, 1500, 4096)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.operators.Relational

    ns.foreach { n =>
      // five series per length (the suite's key count): drifting tapes
      // with hash noise, value scale like events
      val panel = spark.range(n.toLong)
        .select(explode(array((0 until 5).map(i => lit("S" + i)): _*)).as("k"),
          col("id").as("db"))
        .withColumn("v", lit(100.0) + col("db").cast("double") * 0.05 +
          pmod(xxhash64(col("k"), col("db")), lit(2000)).cast("double") / 1000.0)
        .localCheckpoint()
      val (mk, wallMk) = time(Relational.mannKendall(
        panel, "k", "db", "v", maxBuckets = 8192).collect())
      val (se, wallSe) = time(Relational.sampleEntropy(
        panel, "k", "db", "v", maxBuckets = 8192).collect())
      val z = mk.map(_.getAs[Double]("z")).min
      val ts = mk.map(_.getAs[Double]("theil_sen")).head
      val sp = se.map(r => Option(r.getAs[Any]("sampen"))
        .map(_.asInstanceOf[Double]).getOrElse(Double.NaN)).head
      println(f"buckets=$n%-6d pairs/key=${n.toLong * (n - 1) / 2}%-9d " +
        f"mannKendall=$wallMk%6.1fs (z_min=$z%.1f ts=$ts%.3f)  " +
        f"sampleEntropy=$wallSe%6.1fs (sampen=$sp%.3f)")
    }
    // the guard trips one step past the budget — the quadratic can
    // never sneak onto an executor unannounced
    val over = spark.range(101L).select(lit("G").as("k"), col("id").as("db"),
      col("id").cast("double").as("v"))
    val msg = try {
      Relational.mannKendall(over, "k", "db", "v", maxBuckets = 100)
      "NO GUARD — BUG"
    } catch { case e: IllegalArgumentException => e.getMessage.take(60) }
    println(s"guard at 101 > maxBuckets=100: $msg")
    spark.stop()
  }
}
