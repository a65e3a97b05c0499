package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.{count, lit, sum}

import graft.core.Ledger

/** Shared-ledger multi-run pruning measurement (round 13): a production
  * ledger is shared by MANY runs (the reference keeps one SQLite file per
  * store for the same reason, `core/pipeline_store.py:540-620`), so a
  * resume probe for one run must not pay for every other run's committed
  * history. The per-run commit-file prefix (`Ledger.runPrefix`) prunes
  * other runs' uncompacted tail files by name; this tool measures that
  * claim against its own in-ledger control:
  *
  *   1. drive R runs × C real per-index commits through the REAL commit
  *      path, round-robin (the interleaving a shared store actually sees);
  *   2. time ONE run's resume probe (completedIndices — name-pruned to
  *      C of the R·C files) cold and median;
  *   3. time the CROSS-RUN summary (runSummary — correctly reads all R·C
  *      files) over the same ledger in the same session: the unpruned
  *      control, same cache state, same process;
  *   4. assert both shapes return exact counts.
  *
  * Usage: `runMain graft.tools.LedgerMultiRun [nRuns] [commitsPerRun]
  * [reps]`. Prints one JSON line.
  */
object LedgerMultiRun {
  def main(args: Array[String]): Unit = {
    val nRuns = args.headOption.map(_.toInt).getOrElse(20)
    val perRun = args.lift(1).map(_.toInt).getOrElse(500)
    val reps = args.lift(2).map(_.toInt).getOrElse(5)
    val dir =
      java.nio.file.Files.createTempDirectory("graft_ledger_multi").toString
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val led = new Ledger(dir)
    def runId(r: Int) = s"multi_run_$r"
    val tCommit0 = System.nanoTime()
    (0 until perRun).foreach { i =>
      (0 until nRuns).foreach { r =>
        led.recordCompleted(spark, runId(r), Seq(i.toLong), 1000L, 10L)
      }
      if ((i + 1) * nRuns % 2000 == 0)
        System.err.println(s"[ledger-multi] ${(i + 1) * nRuns} commits")
    }
    val commitSec = (System.nanoTime() - tCommit0) / 1e9

    def timed[A](n: Int)(f: => A): (Double, Double, A) = {
      var out: A = f // cold
      val t0 = System.nanoTime()
      out = f
      val cold = (System.nanoTime() - t0) / 1e9
      val times = (1 to n).map { _ =>
        val t = System.nanoTime(); out = f; (System.nanoTime() - t) / 1e9
      }
      (cold, times.sorted.apply(times.size / 2), out)
    }

    // NOTE on "cold": the JVM/Spark session is warm from the commit loop in
    // both arms; cold here means first planning pass over the final file
    // set. The pruned and control arms run back-to-back in the same state,
    // so their RATIO is the pruning effect.
    val (prunedCold, prunedMed, oneRun) = timed(reps) {
      led.completedIndices(spark, runId(0))
        .agg(count(lit(1)), sum("idx")).collect()(0)
    }
    require(oneRun.getLong(0) == perRun,
      s"run 0 completed count ${oneRun.getLong(0)} != $perRun")
    require(oneRun.getLong(1) == perRun.toLong * (perRun - 1) / 2,
      "run 0 completed-set content drift")

    val (ctrlCold, ctrlMed, allRows) = timed(reps) {
      led.runSummary(spark)
        .agg(sum("n_indices")).collect()(0)
    }
    require(allRows.getLong(0) == nRuns.toLong * perRun,
      s"cross-run total ${allRows.getLong(0)} != ${nRuns * perRun}")

    println(s"""{"tool":"ledger_multi_run","n_runs":$nRuns,""" +
      s""""commits_per_run":$perRun,"total_files":${nRuns * perRun},""" +
      s""""commit_sec":$commitSec,""" +
      s""""probe_pruned_cold_sec":$prunedCold,""" +
      s""""probe_pruned_med_sec":$prunedMed,""" +
      s""""probe_allruns_cold_sec":$ctrlCold,""" +
      s""""probe_allruns_med_sec":$ctrlMed,""" +
      s""""pruning_speedup_med":${ctrlMed / math.max(prunedMed, 1e-9)}}""")
    spark.stop()
  }
}
