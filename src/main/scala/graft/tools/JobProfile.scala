package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

import scala.collection.concurrent.TrieMap

/** Job-level wall breakdown for one SparkEntry query — prints every Spark
  * job's duration and first-stage name so the expensive phase of a
  * multi-job query (streaming micro-batches, trainer collects, staged
  * writes) is identified from evidence instead of guessed.
  *
  * Usage: `runMain graft.tools.JobProfile <queryName> [sfDir] [reps]`
  */
object JobProfile {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("q_streaming_join")
    val dir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(2).map(_.toInt).getOrElse(2)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", cpus))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val starts = new TrieMap[Int, (Long, String)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        val desc = Option(j.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .getOrElse(j.stageInfos.lastOption.map(_.name.take(80)).getOrElse(""))
        starts.put(j.jobId, (System.nanoTime(), desc))
      }
      override def onJobEnd(j: SparkListenerJobEnd): Unit =
        starts.remove(j.jobId).foreach { case (t0, desc) =>
          val ms = (System.nanoTime() - t0) / 1e6
          if (ms > 50)
            println(f"[job] ${j.jobId}%4d ${ms / 1000.0}%8.3f s  $desc")
        }
    })
    val fn = graft.SparkEntry.queries(name)
    (1 to reps).foreach { rep =>
      println(s"--- $name rep $rep ---")
      val t0 = System.nanoTime()
      fn(spark, dir).count()
      println(f"[total] ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
