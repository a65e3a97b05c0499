package graft.tools

import org.apache.spark.sql.SparkSession

import graft.core.Ledger

/** Reset-family scale shapes (VERDICT r13 measured these ad hoc in a
  * shell; this makes the split reproducible): a two-run ledger with N
  * commits per run, then `resetRun` against each physical shape —
  *
  *  1. UNCOMPACTED: the run's history is N run-prefixed tail files; the
  *     reset is one column-pruned run_id scan over those files (the r14
  *     prefix-collision guard) followed by N pure unlinks — no rewrite,
  *     no other run's data read.
  *  2. COMPACTED + LIVE SIBLING: after `compact()` folds both runs into
  *     shared bins and a third run commits a fresh tail, the reset is one
  *     bounded read-filter-rewrite of the small shared bins; the live
  *     sibling's tail files are untouched by construction.
  *
  * Sibling-run integrity (exact completed counts) is asserted in both
  * shapes. Prints one JSON line.
  *
  * Usage: `runMain graft.tools.ResetScale [commitsPerRun] [freshCommits]`
  */
object ResetScale {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(5000)
    val fresh = args.lift(1).map(_.toInt).getOrElse(1000)
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val dir = java.nio.file.Files.createTempDirectory("graft_reset_scale").toString
    val led = new Ledger(dir)
    val tCommit0 = System.nanoTime()
    (0L until n.toLong).foreach { i =>
      led.recordCompleted(spark, "run_a", Seq(i), 1000L, 10L)
      led.recordCompleted(spark, "run_b", Seq(i), 1000L, 10L)
      if ((i + 1) % 1000 == 0)
        System.err.println(s"[reset-scale] ${i + 1}/$n commit pairs")
    }
    val commitSec = (System.nanoTime() - tCommit0) / 1e9

    // shape 1: uncompacted tail — verify-scan + pure unlinks
    val t1 = System.nanoTime()
    val rep1 = led.resetRun(spark, "run_a")
    val resetUncompactedSec = (System.nanoTime() - t1) / 1e9
    require(led.completedIndices(spark, "run_a").count() == 0,
      "run_a survived its reset")
    require(led.completedIndices(spark, "run_b").count() == n.toLong,
      "sibling run_b lost rows to run_a's reset")

    // shape 2: compacted bins + a live third run's fresh tail
    val tc = System.nanoTime()
    led.compact(spark)
    val compactSec = (System.nanoTime() - tc) / 1e9
    (0L until fresh.toLong).foreach(i =>
      led.recordCompleted(spark, "run_c", Seq(i), 1000L, 10L))
    val t2 = System.nanoTime()
    led.resetRun(spark, "run_b")
    val resetCompactedSec = (System.nanoTime() - t2) / 1e9
    require(led.completedIndices(spark, "run_b").count() == 0,
      "run_b survived its reset")
    require(led.completedIndices(spark, "run_c").count() == fresh.toLong,
      "live sibling run_c lost rows to run_b's reset")

    println(s"""{"tool":"reset_scale","commits_per_run":$n,""" +
      s""""fresh_commits":$fresh,"commit_sec":$commitSec,""" +
      s""""reset_uncompacted_sec":$resetUncompactedSec,""" +
      s""""unlinked_files":${rep1.values.sum},""" +
      s""""compact_sec":$compactSec,""" +
      s""""reset_compacted_sec":$resetCompactedSec}""")
    spark.stop()
  }
}
