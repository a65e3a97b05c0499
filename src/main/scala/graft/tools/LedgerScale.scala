package graft.tools

import org.apache.spark.sql.SparkSession

import graft.core.Ledger

/** Ledger small-files decade measurement (VERDICT r11 item 2): `runPerIndex`
  * commits one tiny parquet file per index, so a 10⁴–10⁵-index run turns
  * the ledger itself into a listing bottleneck — every resume probe
  * (`completedIndices` → anti-join) pays a footer read per commit file.
  * The reference's SQLite WAL never pays this (one B-tree); our answer is
  * `Ledger.compact`. This tool measures the claim:
  *
  *   1. drive N real per-index commits through the REAL commit path
  *      (`recordCompleted` — stage-then-rename, one file per commit);
  *   2. time the resume probe (completedIndices().count()) against the
  *      fragmented ledger, repeated `reps` times (median);
  *   3. `compact()`, verify the completed set is bit-identical;
  *   4. time the same probe against the compacted ledger.
  *
  * Usage: `runMain graft.tools.LedgerScale [nCommits] [reps] [ledgerDir]
  * [compactEvery]` — a POSITIVE `compactEvery` (r13, VERDICT item 5)
  * interleaves `compact()` INTO the run every N commits, the way a
  * 10⁵-index production run would actually operate, and records a
  * mid-run probe after each compaction: the claim of the whole design is
  * that the resume probe stays O(current file count) — bounded by the
  * compaction cadence — rather than O(total committed indices). Each
  * mid-run probe also re-asserts the completed COUNT and the completed-set
  * CONTENT (sum of indices) across the compaction boundary. Claim listing
  * is O(1) in committed history structurally: claims live in per-
  * invocation namespaces, so a fresh invocation starts from an empty dir
  * no matter how many indices past runs committed.
  *
  * A NEGATIVE `compactEvery` = −maxFilesPerTable selects the POLICY mode
  * (r14): instead of a fixed cadence, every 100 commits calls
  * `Ledger.maintainIfNeeded(maxFilesPerTable)` — the steady-state call is
  * one LIST per table, lock-free — and records a mid-probe row whenever
  * the policy actually compacted. The probe-latency trajectory must match
  * the manual-cadence table (both bound the file count; the policy just
  * derives the cadence from the threshold).
  *
  * Prints one JSON line: commit wall, file counts, probe medians, speedup,
  * and the mid-run probe trajectory.
  */
object LedgerScale {

  /** (first-probe sec, median sec, row count): the first probe pays the
    * cold listing + footer reads — the resume-latency a fresh session
    * actually experiences; later reps ride the shared file-status cache
    * and isolate the per-plan footer cost.
    */
  private def probeSec(spark: SparkSession, led: Ledger, runId: String,
                       reps: Int): (Double, Double, Long) = {
    var n = 0L
    val times = (1 to reps).map { _ =>
      val t0 = System.nanoTime()
      n = led.completedIndices(spark, runId).count()
      (System.nanoTime() - t0) / 1e9
    }
    (times.head, times.sorted.apply(times.size / 2), n)
  }

  def main(args: Array[String]): Unit = {
    val nCommits = args.headOption.map(_.toInt).getOrElse(10000)
    val reps = args.lift(1).map(_.toInt).getOrElse(5)
    val dir = args.lift(2).getOrElse(
      java.nio.file.Files.createTempDirectory("graft_ledger_scale").toString)
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val compactEvery = args.lift(3).map(_.toInt).getOrElse(0)
    val led = new Ledger(dir)
    val runId = "scale_run"
    var compactTotalSec = 0.0
    val midProbes = Seq.newBuilder[String]
    val tCommit0 = System.nanoTime()
    (0L until nCommits.toLong).foreach { i =>
      led.recordCompleted(spark, runId, Seq(i), 1000L, 10L)
      if ((i + 1) % 1000 == 0)
        System.err.println(s"[ledger-scale] ${i + 1}/$nCommits commits")
      val policyDue = compactEvery < 0 && (i + 1) % 100 == 0
      if ((compactEvery > 0 && (i + 1) % compactEvery == 0) || policyDue) {
        val tc = System.nanoTime()
        val rep =
          if (policyDue)
            led.maintainIfNeeded(spark, maxFilesPerTable = -compactEvery)
              .getOrElse(sys.error("maintainIfNeeded refused with no rival"))
          else led.compact(spark)
        val cSec = (System.nanoTime() - tc) / 1e9
        compactTotalSec += cSec
        if (rep.nonEmpty) { // policy under threshold = no work, no probe row
          val tp = System.nanoTime()
          val agg = led.completedIndices(spark, runId)
            .agg(org.apache.spark.sql.functions.count(
              org.apache.spark.sql.functions.lit(1)),
              org.apache.spark.sql.functions.sum("idx")).collect()(0)
          val pSec = (System.nanoTime() - tp) / 1e9
          // count AND content across the compaction boundary
          require(agg.getLong(0) == i + 1,
            s"completed count ${agg.getLong(0)} != ${i + 1} after mid-run compact")
          require(agg.getLong(1) == i * (i + 1) / 2,
            s"completed-set content drift after mid-run compact at ${i + 1}")
          val files = rep.get("index_results").map(_._2).getOrElse(-1)
          midProbes += s"""{"at":${i + 1},"files":$files,""" +
            s""""compact_sec":$cSec,"probe_sec":$pSec}"""
          System.err.println(s"[ledger-scale] compacted at ${i + 1}: " +
            s"$files files, probe ${pSec}s")
        }
      }
    }
    val commitSec = (System.nanoTime() - tCommit0) / 1e9 - compactTotalSec

    def parquetFiles(): Int = {
      def walk(f: java.io.File): Int =
        if (f.isDirectory) f.listFiles().map(walk).sum
        else if (f.getName.endsWith(".parquet")) 1 else 0
      walk(new java.io.File(s"$dir/index_results"))
    }
    val filesBefore = parquetFiles()
    val (coldBefore, medBefore, nBefore) = probeSec(spark, led, runId, reps)

    val tCompact0 = System.nanoTime()
    val report = led.compact(spark)
    val compactSec = (System.nanoTime() - tCompact0) / 1e9
    val filesAfter = parquetFiles()
    val (coldAfter, medAfter, nAfter) = probeSec(spark, led, runId, reps)
    require(nBefore == nCommits && nAfter == nCommits,
      s"completed-set drift: $nBefore before vs $nAfter after vs $nCommits committed")

    println(s"""{"tool":"ledger_scale","n_commits":$nCommits,""" +
      s""""commit_sec":$commitSec,"compact_every":$compactEvery,""" +
      s""""mid_compact_total_sec":$compactTotalSec,""" +
      s""""mid_probes":[${midProbes.result().mkString(",")}],""" +
      s""""files_before":$filesBefore,""" +
      s""""files_after":$filesAfter,"compact_sec":$compactSec,""" +
      s""""probe_cold_before_sec":$coldBefore,"probe_med_before_sec":$medBefore,""" +
      s""""probe_cold_after_sec":$coldAfter,"probe_med_after_sec":$medAfter,""" +
      s""""probe_speedup_cold":${coldBefore / math.max(coldAfter, 1e-9)},""" +
      s""""report":"${report.map { case (k, v) => s"$k:${v._1}->${v._2}" }
        .toSeq.sorted.mkString(",")}"}""")
    spark.stop()
  }
}
