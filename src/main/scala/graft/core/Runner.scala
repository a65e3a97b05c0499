package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Result of one `runPipeline` invocation. */
final case class RunResult(
    runId: String,
    nTotal: Long,
    nSkipped: Long,
    nExecuted: Long,
    writtenPaths: Seq[String])

/** Distributed pipeline execution with resume (reference
  * `run/__init__.py:169-315` + `core/base.py:508-689`, re-expressed on
  * Spark's scheduler):
  *
  *  - the *index* is a partition-key column of the source DataFrame (one
  *    curator index == one group of rows), not a Python worker unit;
  *  - checkpoint skip is a ledger anti-join BEFORE the action, so skipped
  *    indices are never read past the scan (partition pruning applies when
  *    the source is partitioned by the index column);
  *  - the reference's per-worker shard files + `gather_pipeline` merge are
  *    replaced by Spark's partial+final aggregation and its all-or-nothing
  *    file commit protocol — per-index isolation survives as per-partition
  *    task retry.
  */
object Runner {

  def runPipeline(spark: SparkSession, pipeline: Pipeline, idxCol: String,
                  ledgerDir: String, resume: Boolean = true): RunResult = {
    val ledger = new Ledger(ledgerDir)
    val runId = pipeline.configHash.take(16)
    val t0 = System.nanoTime()

    val full = pipeline.dataFrame(spark)
    val completed = ledger.completedIndices(spark, runId)
    val work = if (resume) ledger.remaining(spark, runId, full, idxCol) else full

    // Skip probe on the INDEX COLUMN only (column-pruned anti-join scan):
    // stops at the first un-completed row in the normal case; in the
    // everything-done case it reads just the index column, never full rows.
    if (resume && work.select(idxCol).isEmpty) {
      val done = completed.count()
      return RunResult(runId, done, done, 0, Nil)
    }

    ledger.recordRunStart(spark, runId, pipeline.canonicalConfig)
    // `observe` piggybacks the row count on the sink's single action —
    // the source is scanned exactly ONCE at full width.
    val obs = org.apache.spark.sql.Observation(s"graft_$runId")
    val observed = work.observe(obs, count(lit(1)).as("n_rows"))
    // per-scheduler-stage wall time for the ledger's stage_metrics table,
    // scoped to THIS run's job group so concurrent jobs in the same session
    // don't pollute stage_metrics
    val group = s"graft_run_$runId"
    val stages = StageListener.attach(spark, Some(group))
    val paths =
      try {
        spark.sparkContext.setJobGroup(group, s"graft pipeline $runId")
        val p = pipeline.sink match {
          case Some(s) => s.write(observed)
          case None => observed.count(); Nil // metrics-only run
        }
        stages.awaitQuiesce() // async bus: drain before detaching
        p
      } finally {
        spark.sparkContext.clearJobGroup()
        StageListener.detach(spark, stages)
      }
    val nRows = obs.get("n_rows").asInstanceOf[Long]
    ledger.recordStageMetrics(spark, runId, stages.records)

    // Accounting AFTER the action succeeded, fully distributed: the executed
    // index set (= full minus previously-completed) is written straight to
    // the ledger — never collected to the driver — and costs one pruned scan
    // of the index column only (partition listing when idx partitions the
    // source). Its count rides on the ledger write's own observe.
    val executedIdx0 = full.select(col(idxCol).cast("long").as("idx")).distinct()
    val executedIdx =
      if (resume) executedIdx0.join(completed, Seq("idx"), "left_anti")
      else executedIdx0
    // nBefore MUST be materialized before recordCompleted appends this run's
    // indices to the same index_results path — counting afterwards would rely
    // on the stale file-index snapshot staying stale (fragile under cache
    // invalidation or a concurrent writer).
    val nBefore = if (resume) completed.count() else 0L
    // run-level peak executor memory = the hungriest stage's summed task
    // peak (reference index_results.peak_memory_bytes parity,
    // core/pipeline_store.py:550-563)
    val peakMem = stages.records.map(_.peakMemoryBytes).maxOption.getOrElse(0L)
    val nExecuted = ledger.recordCompleted(spark, runId, executedIdx,
      System.nanoTime() - t0, nRows, peakMem)
    RunResult(runId, nBefore + nExecuted, nBefore, nExecuted, paths)
  }

  /** Per-index execution: one Spark job per curator index, each COMMITTED
    * TO THE LEDGER AS IT COMPLETES — the reference's actual work-unit model
    * (`core/base.py:595-602`, one artifact + one checkpoint row per index),
    * where a crash mid-run leaves the completed prefix durable and a resume
    * executes exactly the remainder. `runPipeline` (one batch action,
    * all-or-nothing commit) is the scale path when the sink is a single
    * artifact; this mode is for per-index sinks and for the
    * partial-failure resume contract (`test_checkpoint.py`).
    *
    * The index list is collected to the driver — bounded by the curator
    * index domain (work units, not rows; the reference enumerates the same
    * list). Indices run in sorted order for deterministic failure
    * prefixes. `beforeIndex` is a driver-side hook (fault injection in
    * tests, progress callbacks); an exception from the hook or the index's
    * own job records an `errors` ledger row for that index and RETHROWS —
    * the completed prefix stays recorded, the failed index is retried on
    * the next run (error status does not mark completion).
    */
  def runPerIndex(spark: SparkSession, pipeline: Pipeline, idxCol: String,
                  ledgerDir: String, resume: Boolean = true,
                  beforeIndex: Long => Unit = _ => ()): RunResult = {
    val ledger = new Ledger(ledgerDir)
    val runId = pipeline.configHash.take(16)

    val full = pipeline.dataFrame(spark)
    val allIdx = full.select(col(idxCol).cast("long").as("idx")).distinct()
      .collect().map(_.getLong(0)).sorted
    val done: Set[Long] =
      if (resume) ledger.completedIndices(spark, runId)
        .collect().map(_.getLong(0)).toSet
      else Set.empty
    val todo = allIdx.filterNot(done)
    if (todo.isEmpty)
      return RunResult(runId, allIdx.length, allIdx.length, 0, Nil)

    ledger.recordRunStart(spark, runId, pipeline.canonicalConfig)
    val paths = Seq.newBuilder[String]
    var executed = 0
    todo.foreach { idx =>
      val t0 = System.nanoTime()
      try {
        beforeIndex(idx)
        val slice = full.filter(col(idxCol).cast("long") === idx)
        val obs = org.apache.spark.sql.Observation()
        val observed = slice.observe(obs, count(lit(1)).as("n_rows"))
        val p = pipeline.sink match {
          case Some(s) => s.write(observed)
          case None => observed.count(); Nil
        }
        val nRows = obs.get("n_rows").asInstanceOf[Long]
        ledger.recordCompleted(spark, runId, Seq(idx),
          System.nanoTime() - t0, nRows)
        paths ++= p
        executed += 1
      } catch {
        case e: Throwable =>
          ledger.recordError(spark, runId, idx, String.valueOf(e.getMessage))
          throw e
      }
    }
    RunResult(runId, done.size + executed, done.size, executed, paths.result())
  }
}
