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
  * [compactEveryMs] [store]` — `store=naf` runs the whole soak on the
  * simulated non-atomic object store (`NonAtomicFileSystem`) with the
  * fencing-token LEASE lock provider, proving the claim/maintenance
  * protocols hold where create-exclusive doesn't exist.
  * Prints one JSON line.
  */
object CompactRace {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(400)
    val w = args.lift(1).map(_.toInt).getOrElse(4)
    val everyMs = args.lift(2).map(_.toLong).getOrElse(25L)
    val store = args.lift(3).getOrElse("file")
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
    val errors =
      new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    // TWO maintenance threads: exercises the lock's mutual exclusion too
    val maint = (1 to 2).map { _ =>
      new Thread(() => {
        while (!stop.get()) {
          try { led.compact(spark, maxFilesPerTable = 16); compactions.incrementAndGet(); () }
          catch {
            case _: IllegalStateException => refusals.incrementAndGet(); ()
            case e: Throwable => errors.add(e); ()
          }
          Thread.sleep(everyMs)
        }
      })
    }
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
    workers.foreach(_.join()); stop.set(true); maint.foreach(_.join())
    val wallSec = (System.nanoTime() - t0) / 1e9
    require(errors.isEmpty, s"threads failed: ${errors.toArray.toSeq}")

    def contentHash(): (Long, Int) = {
      val rows = spark.read.option("mergeSchema", "true")
        .parquet(s"$ledgerDir/index_results")
        .filter(col("run_id") === runId && col("status") === "completed")
        .select("idx", "run_id", "status", "n_rows", "worker_id")
        .orderBy("idx").collect()
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

    println(s"""{"tool":"compact_race","n_indices":$n,"n_workers":$w,""" +
      s""""wall_sec":$wallSec,"compactions":${compactions.get()},""" +
      s""""lock_refusals":${refusals.get()},""" +
      s""""final_files":${finalReport.get("index_results").map(_._2).getOrElse(-1)},""" +
      s""""lost_updates":0,"content_stable":true}""")
    spark.stop()
  }
}
