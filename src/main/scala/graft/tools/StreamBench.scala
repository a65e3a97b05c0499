package graft.tools

import org.apache.spark.sql.SparkSession

import scala.util.Try

/** Load-normalized streaming-family baseline (VERDICT r8 item 1).
  *
  * The streaming queries replay fixed files through AvailableNow
  * micro-batches, so their wall time is dominated by the per-batch
  * scheduling floor — which is the part most sensitive to shared-VM load.
  * Driver-batch outliers (q_streaming_kmv in r7, q_streaming_cms /
  * q_streaming_join in r8) have repeatedly turned out to be load noise, so
  * this tool IS the controlled protocol: reps >= 5 per query, 1 warm-up
  * rep discarded, `/proc/loadavg` sampled before and after each query, one
  * JSON line per query with the median/min plus the load context, and a
  * trailing summary line for BASELINE.md. Re-run any round a streaming
  * number looks regressed before treating it as real.
  *
  * `runMain graft.tools.StreamBench [sfDir] [reps]`
  */
object StreamBench {
  private val Family = Seq(
    "q_streaming_stats", "q_streaming_dedup", "q_streaming_cms",
    "q_streaming_kmv", "q_streaming_trending", "q_streaming_sessions",
    "q_streaming_join")

  private def loadavg(): String =
    Try(scala.io.Source.fromFile("/proc/loadavg").getLines().next()
      .split(" ").head).getOrElse("?")

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = if (args.length > 1) args(1).toInt else 5
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val medians = Family.map { name =>
      val q = graft.SparkEntry.queries(name)
      val load0 = loadavg()
      // warm-up rep: JIT + codegen cache + checkpoint-dir creation
      q(spark, dir).count()
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        q(spark, dir).count()
        (System.nanoTime() - t0) / 1e9
      }.sorted
      val med = times(times.length / 2)
      val load1 = loadavg()
      println(f"""{"query":"$name","median_sec":$med%.2f,"min_sec":${times.head}%.2f,"max_sec":${times.last}%.2f,"reps":$reps,"load_before":$load0,"load_after":$load1}""")
      name -> med
    }
    val total = medians.map(_._2).sum
    println(f"""{"tool":"StreamBench","sf_dir":"$dir","reps":$reps,"family_total_sec":$total%.2f,"queries":${medians.map { case (n, m) => f""""$n":$m%.2f""" }.mkString("{", ",", "}")}}""")
    spark.stop()
  }
}
