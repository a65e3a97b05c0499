package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.core.{Ledger, PFilter, PSink, PSource, Pipeline, Runner}

/** Maintenance-vs-committers soak (VERDICT r12 item 1 — the scale companion
  * to CoreSpec's compact-race test): W worker threads drive `runPerIndex`
  * through ONE ledger while a maintenance thread loops `Ledger.compact()`
  * the whole time. The r12 compact() swapped the table directory, so a
  * commit racing the swap could land its stage-then-rename file in the
  * retired directory and be silently deleted; the r13 protocol installs
  * compacted files into the live dir and deletes exactly its read snapshot,
  * so commits (pure file adds) structurally survive. This tool asserts
  * that at a scale where the races actually interleave:
  *
  *  - zero lost updates: every index completes exactly once; raw
  *    index_results row count == N with no duplicates;
  *  - content integrity: the sorted row content hash before a final
  *    full compaction equals the hash after it;
  *  - mutual exclusion: concurrent compactors serialized by the
  *    maintenance lock (refusals counted, never corrupting);
  *  - heartbeat/provenance tables survive too (workersDf sums to N).
  *
  * Usage: `runMain graft.tools.CompactRace [nIndices] [nWorkers]
  * [compactEveryMs] [store] [steal]` — `store=naf` runs the whole soak on
  * the simulated non-atomic object store (`NonAtomicFileSystem`) with the
  * fencing-token LEASE lock provider, proving the claim/maintenance
  * protocols hold where create-exclusive doesn't exist. `steal` (naf
  * only) adds a FORCED-STEAL arm: a rival thread periodically overwrites
  * the maintenance lease mid-soak (ttl 0 = everything is stale), so live
  * compactors lose their fence mid-rewrite and must ABORT before their
  * destructive phase (counted as fence_aborts). Steal-mode integrity is
  * asserted on the resolve-at-read views (a fence abort between install
  * and snapshot-delete legitimately leaves duplicate ROWS, the documented
  * tolerated state — never lost ones).
  * Prints one JSON line.
  */
object CompactRace {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(400)
    val w = args.lift(1).map(_.toInt).getOrElse(4)
    val everyMs = args.lift(2).map(_.toLong).getOrElse(25L)
    val store = args.lift(3).getOrElse("file")
    val steal = args.lift(4).contains("steal")
    require(!steal || store == "naf",
      "the forced-steal arm needs the lease provider (store=naf): " +
        "create-exclusive has no token to steal")
    val spark = SparkSession.builder()
      .master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val ledgerDir = RaceStores.ledgerDir(spark, store, "graft_compact_race")
    val pipe = Pipeline(
      PSource("range", Map("n" -> n.toString), s =>
        s.range(n).withColumnRenamed("id", "idx")
          .withColumn("value", col("idx") * 3)),
      Vector(PFilter("keep_all", Map.empty,
        identity[org.apache.spark.sql.DataFrame])),
      Some(PSink("noop_count", Map.empty, df => { df.count(); Nil })))
    val runId = pipe.configHash.take(16)
    val led = new Ledger(ledgerDir)

    val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
    val compactions = new java.util.concurrent.atomic.AtomicInteger(0)
    val refusals = new java.util.concurrent.atomic.AtomicInteger(0)
    val fenceAborts = new java.util.concurrent.atomic.AtomicInteger(0)
    val errors =
      new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    // TWO maintenance threads: exercises the lock's mutual exclusion too
    val maint = (1 to 2).map { _ =>
      new Thread(() => {
        while (!stop.get()) {
          try { led.compact(spark, maxFilesPerTable = 16); compactions.incrementAndGet(); () }
          catch {
            case e: IllegalStateException
                if e.getMessage.contains("lost mid-") =>
              fenceAborts.incrementAndGet(); ()
            case _: IllegalStateException => refusals.incrementAndGet(); ()
            case e: Throwable => errors.add(e); ()
          }
          Thread.sleep(everyMs)
        }
      })
    }
    // forced-steal arm: a rival lease-holder overwrites the maintenance
    // lock mid-soak, holds it briefly, and releases — live compactors
    // must fence-abort, never rewrite without exclusion
    val stealer = new Thread(() => {
      val lockPath = new org.apache.hadoop.fs.Path(
        s"$ledgerDir/_maintenance/compact.lock")
      val fs = lockPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
      while (!stop.get()) {
        Thread.sleep(everyMs * 4)
        try {
          val rival = new graft.core.LockProvider.Lease(
            fs.getConf.getLong("graft.lock.lease.settle.ms", 60L))
          if (rival.tryAcquire(fs, lockPath, 0L)) { // everything is stale
            Thread.sleep(everyMs)
            rival.release(fs, lockPath)
          }
        } catch { case _: Throwable => () }
      }
    })
    val t0 = System.nanoTime()
    val workers = (1 to w).map { i =>
      new Thread(() => {
        try {
          Runner.runPerIndex(spark, pipe, "idx", ledgerDir,
            workerId = s"w_$i", invocationId = Some("race_inv"))
          ()
        } catch { case e: Throwable => errors.add(e); () }
      })
    }
    maint.foreach(_.start()); workers.foreach(_.start())
    if (steal) stealer.start()
    workers.foreach(_.join())
    // The steal arm's whole point is a steal interleaving a LIVE rewrite;
    // that interleave is timing-dependent, so rather than hard-failing a
    // correct run that never hit it (compactors keep rewriting after the
    // workers drain), keep the maintainers + stealer running until at
    // least one fence abort is observed or a generous deadline passes.
    if (steal) {
      val deadline = System.nanoTime() + 120L * 1000 * 1000 * 1000
      while (fenceAborts.get() == 0 && System.nanoTime() < deadline)
        Thread.sleep(100)
    }
    stop.set(true); maint.foreach(_.join())
    if (steal) stealer.join()
    val wallSec = (System.nanoTime() - t0) / 1e9
    require(errors.isEmpty, s"threads failed: ${errors.toArray.toSeq}")

    def contentHash(): (Long, Int) = {
      // steal mode asserts on the resolve-at-read view: a fence abort
      // between install and snapshot-delete leaves duplicate ROWS (the
      // documented tolerated state); latest-wins resolution must still
      // see exactly one completion per index, before and after the final
      // compaction. Raw-row uniqueness stays the no-steal assertion.
      val raw = spark.read.option("mergeSchema", "true")
        .parquet(s"$ledgerDir/index_results")
        .filter(col("run_id") === runId && col("status") === "completed")
        .select("idx", "run_id", "status", "n_rows", "worker_id")
      val rows = (if (steal) raw.distinct() else raw).orderBy("idx").collect()
      (rows.length.toLong, rows.map(_.mkString("|")).mkString("\n").hashCode)
    }
    val (rawRows, hashBefore) = contentHash()
    require(rawRows == n, s"lost/duplicated commits: $rawRows raw rows != $n")
    val nDistinct = led.completedIndices(spark, runId).count()
    require(nDistinct == n, s"completed set $nDistinct != $n")
    // final full compaction with no writers: content must be bit-stable
    val finalReport = led.compact(spark, maxFilesPerTable = 1)
    val (rowsAfter, hashAfter) = contentHash()
    require(rowsAfter == n && hashAfter == hashBefore,
      s"content drift across final compaction: $rowsAfter rows")
    val splits = led.workersDf(spark, runId)
      .agg(sum("completed")).collect()(0).getLong(0)
    require(splits == n, s"workersDf sums $splits != $n")
    val stealInterleaved = !steal || fenceAborts.get() > 0
    if (!stealInterleaved)
      System.err.println("[compact_race] WARNING: steal arm ran but no " +
        "compactor fence-aborted within the deadline — the steal never " +
        "interleaved with a live rewrite (timing-dependent, not a " +
        "correctness failure); rerun for a demonstrative abort count")

    println(s"""{"tool":"compact_race","n_indices":$n,"n_workers":$w,""" +
      s""""wall_sec":$wallSec,"compactions":${compactions.get()},""" +
      s""""lock_refusals":${refusals.get()},""" +
      s""""fence_aborts":${fenceAborts.get()},"steal":$steal,""" +
      s""""steal_interleaved":$stealInterleaved,""" +
      s""""final_files":${finalReport.get("index_results").map(_._2).getOrElse(-1)},""" +
      s""""lost_updates":0,"content_stable":true}""")
    spark.stop()
  }
}
