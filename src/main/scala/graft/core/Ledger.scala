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
    */
  def recordCompleted(spark: SparkSession, runId: String, indices: Seq[Long],
                      wallNs: Long, nRows: Long, peakMemoryBytes: Long,
                      gpuMemoryBytes: Option[Long]): Unit = {
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
                      gpuMemoryBytes: Option[Long] = None): Long = {
    val obs = org.apache.spark.sql.Observation()
    indices.select(col("idx").cast("long"))
      .withColumn("run_id", lit(runId))
      .withColumn("status", lit("completed"))
      .withColumn("wall_ns", lit(wallNs))
      .withColumn("n_rows", lit(nRows))
      .withColumn("peak_memory_bytes", lit(peakMemoryBytes))
      .withColumn("gpu_memory_bytes",
        gpuMemoryBytes.map(lit(_)).getOrElse(lit(null)).cast("long"))
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

  def recordError(spark: SparkSession, runId: String, idx: Long, error: String): Unit = {
    import spark.implicits._
    Seq((idx, runId, "error", 0L, 0L, System.currentTimeMillis(), error))
      .toDF("idx", "run_id", "status", "wall_ns", "n_rows", "finished_at", "error")
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
}
