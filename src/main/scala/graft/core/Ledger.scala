package graft.core

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Checkpoint + metrics ledger as partitioned Parquet (replaces the
  * reference's SQLite store, schema `core/pipeline_store.py:540-620`).
  *
  * Layout: `<dir>/index_results/` rows `(run_id, idx, status, wall_ns,
  * n_rows, finished_at)`; `<dir>/runs/` rows `(run_id, config_json,
  * started_at)`. Appends are per-run-partition files, so concurrent runs of
  * different pipelines never collide. Resume = anti-join of the work list
  * against completed indices (`core/base.py:595-602` → SURVEY §2.5) — a
  * broadcastable join when the remaining-run ledger is small, a shuffled
  * anti-join at 100 TB, both picked by Catalyst.
  */
final class Ledger(dir: String) {
  /** The ledger root, for callers reading a table directly. */
  def path: String = dir
  private def idxPath = s"$dir/index_results"
  private def runsPath = s"$dir/runs"

  def recordRunStart(spark: SparkSession, runId: String, configJson: String): Unit = {
    import spark.implicits._
    Seq((runId, configJson, System.currentTimeMillis()))
      .toDF("run_id", "config_json", "started_at")
      .coalesce(1).write.mode(SaveMode.Append).parquet(runsPath)
  }

  def recordCompleted(spark: SparkSession, runId: String, indices: Seq[Long],
                      wallNs: Long, nRows: Long): Unit =
    recordCompleted(spark, runId, indices, wallNs, nRows, 0L)

  def recordCompleted(spark: SparkSession, runId: String, indices: Seq[Long],
                      wallNs: Long, nRows: Long,
                      peakMemoryBytes: Long): Unit =
    recordCompleted(spark, runId, indices, wallNs, nRows, peakMemoryBytes, None)

  /** `gpuMemoryBytes` mirrors the reference's nullable `gpu_memory_bytes`
    * (`core/pipeline_store.py:550-563`): always None on CPU runs — Spark
    * here schedules no GPUs — but the column exists so schema-compatible
    * artifact readers see the reference's full index_results shape.
    * `workerId` is the reference's `worker_id` claim column: here the
    * claiming process is always the Spark DRIVER (executors are fungible
    * task slots under one claim, not per-index workers), so the default
    * identifies the submitting session.
    */
  def recordCompleted(spark: SparkSession, runId: String, indices: Seq[Long],
                      wallNs: Long, nRows: Long, peakMemoryBytes: Long,
                      gpuMemoryBytes: Option[Long]): Unit =
    recordCompleted(spark, runId, indices, wallNs, nRows, peakMemoryBytes,
      gpuMemoryBytes, "driver")

  def recordCompleted(spark: SparkSession, runId: String, indices: Seq[Long],
                      wallNs: Long, nRows: Long, peakMemoryBytes: Long,
                      gpuMemoryBytes: Option[Long],
                      workerId: String): Unit = {
    if (indices.isEmpty) return
    import spark.implicits._
    indices.toDF("idx")
      .withColumn("run_id", lit(runId))
      .withColumn("status", lit("completed"))
      .withColumn("wall_ns", lit(wallNs))
      .withColumn("n_rows", lit(nRows))
      .withColumn("peak_memory_bytes", lit(peakMemoryBytes))
      .withColumn("gpu_memory_bytes",
        gpuMemoryBytes.map(lit(_)).getOrElse(lit(null)).cast("long"))
      .withColumn("worker_id", lit(workerId))
      .withColumn("finished_at", lit(System.currentTimeMillis()))
      .coalesce(1).write.mode(SaveMode.Append).parquet(idxPath)
  }

  /** Distributed variant: `indices` is a single-column (`idx`, long)
    * DataFrame written straight to the ledger — the index set never lands
    * on the driver (at 100 TB a run can have millions of indices). Returns
    * the recorded count, piggybacked on the write via `observe`.
    */
  def recordCompleted(spark: SparkSession, runId: String, indices: DataFrame,
                      wallNs: Long, nRows: Long,
                      peakMemoryBytes: Long = 0L,
                      gpuMemoryBytes: Option[Long] = None,
                      workerId: String = "driver"): Long = {
    val obs = org.apache.spark.sql.Observation()
    indices.select(col("idx").cast("long"))
      .withColumn("run_id", lit(runId))
      .withColumn("status", lit("completed"))
      .withColumn("wall_ns", lit(wallNs))
      .withColumn("n_rows", lit(nRows))
      .withColumn("peak_memory_bytes", lit(peakMemoryBytes))
      .withColumn("gpu_memory_bytes",
        gpuMemoryBytes.map(lit(_)).getOrElse(lit(null)).cast("long"))
      .withColumn("worker_id", lit(workerId))
      .withColumn("finished_at", lit(System.currentTimeMillis()))
      .observe(obs, count(lit(1)).as("n"))
      .write.mode(SaveMode.Append).parquet(idxPath)
    obs.get("n").asInstanceOf[Long]
  }

  /** Per-scheduler-stage wall-time rows for a run — the reference's
    * `stage_metrics` table (`pipeline_store.py:565-572`, stage_order ↔
    * stageId order, stage_name ↔ Spark's stage callsite name).
    */
  def recordStageMetrics(spark: SparkSession, runId: String,
                         stages: Seq[StageListener#StageRec]): Unit = {
    if (stages.isEmpty) return
    import spark.implicits._
    stages.sortBy(_.stageId).zipWithIndex
      .map { case (s, ord) =>
        (runId, ord, s.stageId, s.name, s.wallNs, s.executorRunNs, s.nTasks,
          s.peakMemoryBytes)
      }
      .toDF("run_id", "stage_order", "stage_id", "stage_name",
        "wall_ns", "executor_run_ns", "n_tasks", "peak_memory_bytes")
      .coalesce(1).write.mode(SaveMode.Append).parquet(s"$dir/stage_metrics")
  }

  /** Stage rows for a run — an empty frame WITH the table schema when none
    * were recorded, so filters/selects on the no-rows path still resolve.
    */
  def stageMetrics(spark: SparkSession, runId: String): DataFrame = {
    val p = s"$dir/stage_metrics"
    if (!pathExists(spark, p)) {
      import spark.implicits._
      Seq.empty[(String, Int, Int, String, Long, Long, Int, Long)]
        .toDF("run_id", "stage_order", "stage_id", "stage_name",
          "wall_ns", "executor_run_ns", "n_tasks", "peak_memory_bytes")
    } else spark.read.parquet(p).filter(col("run_id") === runId)
  }

  def recordError(spark: SparkSession, runId: String, idx: Long,
                  error: String): Unit =
    recordError(spark, runId, idx, error, "driver")

  def recordError(spark: SparkSession, runId: String, idx: Long, error: String,
                  workerId: String): Unit = {
    import spark.implicits._
    Seq((idx, runId, "error", 0L, 0L, workerId, System.currentTimeMillis(), error))
      .toDF("idx", "run_id", "status", "wall_ns", "n_rows", "worker_id",
        "finished_at", "error")
      .coalesce(1).write.mode(SaveMode.Append).parquet(s"$dir/errors")
  }

  /** Structured run logs — the reference's `logs` table
    * (`pipeline_store.py:592-604`): (run_id, ts, level, logger, message,
    * idx). Batched appends: collect log rows, write once per flush, so
    * logging never becomes one-file-per-message at scale.
    */
  def recordLogs(spark: SparkSession, runId: String,
                 entries: Seq[(String, String, String, Long)]): Unit = {
    if (entries.isEmpty) return
    import spark.implicits._
    entries.toDF("level", "logger_name", "message", "idx")
      .withColumn("run_id", lit(runId))
      .withColumn("ts", lit(System.currentTimeMillis()))
      .coalesce(1).write.mode(SaveMode.Append).parquet(s"$dir/logs")
  }

  /** Log rows for a run — schema-typed empty frame when none were written. */
  def logs(spark: SparkSession, runId: String): DataFrame = {
    val p = s"$dir/logs"
    if (!pathExists(spark, p)) {
      import spark.implicits._
      Seq.empty[(String, String, String, Long, String, Long)]
        .toDF("level", "logger_name", "message", "idx", "run_id", "ts")
    } else spark.read.parquet(p).filter(col("run_id") === runId)
  }

  private def pathExists(spark: SparkSession, p: String): Boolean = {
    // Hadoop FS API, not java.io.File — the ledger dir may be HDFS/S3/GCS
    val hp = new org.apache.hadoop.fs.Path(p)
    hp.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(hp)
  }

  /** Completed indices for a run — empty frame when the ledger doesn't exist. */
  def completedIndices(spark: SparkSession, runId: String): DataFrame = {
    import spark.implicits._
    if (!pathExists(spark, idxPath)) Seq.empty[Long].toDF("idx")
    else spark.read.parquet(idxPath)
      .filter(col("run_id") === runId && col("status") === "completed")
      .select("idx").distinct()
  }

  /** Failed indices for a run (`core/base.py:858-951` failed_indices). */
  def failedIndices(spark: SparkSession, runId: String): DataFrame = {
    import spark.implicits._
    val errPath = s"$dir/errors"
    if (!pathExists(spark, errPath)) Seq.empty[Long].toDF("idx")
    else spark.read.parquet(errPath)
      .filter(col("run_id") === runId)
      .select("idx").distinct()
  }

  /** Checkpoint skip: work list minus completed ledger (left-anti join). */
  def remaining(spark: SparkSession, runId: String, work: DataFrame,
                idxCol: String): DataFrame =
    work.join(completedIndices(spark, runId).withColumnRenamed("idx", idxCol),
      Seq(idxCol), "left_anti")

  /** Per-run summary over the metrics rows (dashboard query layer,
    * `dashboard/data.py:49-321`, as one grouped aggregation).
    */
  def runSummary(spark: SparkSession): DataFrame =
    spark.read.parquet(idxPath)
      .groupBy("run_id", "status")
      .agg(count(lit(1)).as("n_indices"),
        sum("n_rows").as("total_rows"),
        avg("wall_ns").as("mean_wall_ns"),
        max("finished_at").as("last_finished_at"))

  // ------------------------------------------------- DashboardStore views
  // The reference's dashboard read layer (`dashboard/data.py:86-321`)
  // re-expressed as DataFrames over the ledger parquet. One divergence,
  // by design: the reference REPLACES an index's error row when a retry
  // completes (PRIMARY KEY (idx, run_id)); this ledger is append-only, so
  // the views resolve retry-wins at read time (a completed row beats any
  // earlier error for `status`, but the error message still rides along —
  // exactly what `index_df` shows after a retry).

  /** `index_df` parity (`dashboard/data.py:86-135`): one row per index the
    * run has touched — completed indices carry their metrics (latest
    * completion wins), failed-only indices merge in with zero metrics;
    * `error` is the (latest) recorded message, empty for never-failed.
    */
  def indexDf(spark: SparkSession, runId: String): DataFrame = {
    import spark.implicits._
    val comp =
      (if (pathExists(spark, idxPath)) spark.read.parquet(idxPath)
         .filter(col("run_id") === runId && col("status") === "completed")
       else Seq.empty[(Long, Long, Long, Long)]
         .toDF("idx", "wall_ns", "peak_memory_bytes", "finished_at")
         .withColumn("gpu_memory_bytes", lit(null).cast("long")))
        .groupBy(col("idx").cast("long").as("idx"))
        .agg(max(struct(col("finished_at"), col("wall_ns"),
          col("peak_memory_bytes"), col("gpu_memory_bytes"))).as("m"))
        .select(col("idx"), col("m.wall_ns").as("_wall"),
          col("m.peak_memory_bytes").as("_peak"),
          col("m.gpu_memory_bytes").as("_gpu"), lit(1).as("_done"))
    val errPath = s"$dir/errors"
    val errs =
      (if (pathExists(spark, errPath)) spark.read.parquet(errPath)
         .filter(col("run_id") === runId)
       else Seq.empty[(Long, Long, String)].toDF("idx", "finished_at", "error"))
        .groupBy(col("idx").cast("long").as("idx"))
        .agg(max(struct(col("finished_at"), col("error"))).as("e"))
        .select(col("idx"), col("e.error").as("_err"))
    comp.join(errs, Seq("idx"), "full_outer")
      .select(col("idx"),
        when(col("_done").isNotNull, "completed").otherwise("error").as("status"),
        (coalesce(col("_wall"), lit(0L)) / 1e9).as("wall_time_s"),
        (coalesce(col("_peak"), lit(0L)) / lit(1048576.0)).as("peak_memory_mb"),
        (coalesce(col("_gpu"), lit(0L)) / lit(1048576.0)).as("gpu_memory_mb"),
        coalesce(col("_err"), lit("")).as("error"))
  }

  /** `stage_df` parity (`dashboard/data.py:137-167`): per-stage timing for
    * the run. The reference breaks stages down per INDEX (its work unit);
    * Spark's scheduler stages span the whole run, so the breakdown is
    * per-run — same columns, coarser grain, documented in SURVEY §3.2.
    */
  def stageDf(spark: SparkSession, runId: String): DataFrame =
    stageMetrics(spark, runId)
      .select(col("stage_order"), col("stage_name"),
        (col("wall_ns") / 1e9).as("wall_time_s"),
        (col("executor_run_ns") / 1e9).as("executor_run_s"),
        col("n_tasks"))

  /** `summary` parity (`pipeline_store.py:1248-1295` via
    * `dashboard/data.py:169-190`): one row of run-state counters. `failed`
    * counts CURRENTLY-failed indices (errored, never completed) so
    * `remaining = total - completed - failed` matches the reference's
    * retry-replaces-error accounting.
    */
  def summaryDf(spark: SparkSession, runId: String, total: Long): DataFrame = {
    val idxView = indexDf(spark, runId)
    idxView.agg(
      lit(total).as("total"),
      sum(when(col("status") === "completed", 1).otherwise(0)).as("completed"),
      sum(when(col("status") === "error", 1).otherwise(0)).as("failed"),
      (lit(total) - count(lit(1))).as("remaining"),
      sum(when(col("status") === "completed", col("wall_time_s"))
        .otherwise(0.0)).as("total_elapsed_s"))
  }

  /** `logs_df` parity (`dashboard/data.py:283-321` over
    * `pipeline_store.get_logs`): the leveled, bounded log tail. Level
    * names map onto Python logging's numeric scale (DEBUG 10 / INFO 20 /
    * WARNING 30 / ERROR 40 — unknown names read as INFO), rows below
    * `minLevel` drop, and the newest `limit` rows survive (the
    * dashboard's tail view; at 100 TB the ledger's logs table is
    * partition-pruned by run_id before any of this runs).
    */
  def logsDf(spark: SparkSession, runId: String, limit: Int = 500,
             minLevel: Int = 0): DataFrame =
    logs(spark, runId)
      .withColumn("level_num",
        when(col("level") === "DEBUG", 10)
          .when(col("level") === "INFO", 20)
          .when(col("level") === "WARNING", 30)
          .when(col("level") === "ERROR", 40)
          .otherwise(20))
      .filter(col("level_num") >= minLevel)
      .orderBy(col("ts").desc, col("idx").desc)
      .limit(limit)
      .select(col("ts"), col("level"), col("level_num"), col("idx"),
        col("logger_name"), col("message"))

  /** `workers_df` parity (`dashboard/data.py:192-231` +
    * `indices_by_worker`, `pipeline_store.py:1200-1246`): per-worker
    * completed/failed index counts. Under Spark the claiming worker is the
    * driver session (executors are task slots, not index claimants), so a
    * single-session run shows one row — honest, not degenerate: multiple
    * concurrent sessions sharing a ledger each appear as their own worker.
    */
  def workersDf(spark: SparkSession, runId: String): DataFrame = {
    import spark.implicits._
    val compRows =
      (if (pathExists(spark, idxPath)) spark.read.parquet(idxPath)
         .filter(col("run_id") === runId && col("status") === "completed")
       else Seq.empty[(Long, String)].toDF("idx", "worker_id"))
        .select(col("worker_id"), col("idx").cast("long").as("idx"))
    val errPath = s"$dir/errors"
    val errRows =
      (if (pathExists(spark, errPath)) spark.read.parquet(errPath)
         .filter(col("run_id") === runId)
       else Seq.empty[(Long, String)].toDF("idx", "worker_id"))
        .select(col("worker_id"), col("idx").cast("long").as("idx"))
        // retry-wins, matching the reference's REPLACE-on-retry rows: an
        // index that later completed no longer counts as failed
        .join(compRows.select("idx").distinct(), Seq("idx"), "left_anti")
    val comp = compRows.groupBy("worker_id")
      .agg(countDistinct("idx").as("completed"))
    val errs = errRows.groupBy("worker_id")
      .agg(countDistinct("idx").as("failed"))
    comp.join(errs, Seq("worker_id"), "full_outer")
      .select(col("worker_id"),
        coalesce(col("completed"), lit(0L)).as("completed"),
        coalesce(col("failed"), lit(0L)).as("failed"))
  }
}
