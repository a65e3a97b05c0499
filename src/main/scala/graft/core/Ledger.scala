package graft.core

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
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

  /** Canonical column contract of every ledger table — the static schema
    * each read requests. The tables gained columns across rounds (runs:
    * run_dir/total_indices, logs: worker_id, stage_metrics: idx) and mixed
    * old+new ledgers are an explicitly supported back-compat case. The
    * first fix (r13) read with `mergeSchema`, which is CORRECT but pays a
    * footer parse per file — O(committed indices) before compaction runs,
    * exactly the probe cost the compaction work exists to bound (measured:
    * the most ledger-read-heavy fixture regressed 2.9 → 3.9 s). A ledger
    * table's schema isn't data-dependent — it is a versioned contract this
    * map states once — so reads request it explicitly: O(1) in file count,
    * old files surface missing columns as null (the same semantics merge
    * gave), and unknown extra columns are ignored on the hot path.
    * `compact()` keeps a mergeSchema read (it is a maintenance pass that
    * already opens every footer) so columns beyond this contract survive
    * rewrites.
    */
  private val tableSchemas: Map[String, org.apache.spark.sql.types.StructType] = {
    import org.apache.spark.sql.types._
    def t(cols: (String, DataType)*): StructType =
      StructType(cols.map { case (n, dt) => StructField(n, dt, nullable = true) })
    Map(
      "runs" -> t("run_id" -> StringType, "config_json" -> StringType,
        "started_at" -> LongType, "run_dir" -> StringType,
        "total_indices" -> LongType),
      "index_results" -> t("idx" -> LongType, "run_id" -> StringType,
        "status" -> StringType, "wall_ns" -> LongType, "n_rows" -> LongType,
        "peak_memory_bytes" -> LongType, "gpu_memory_bytes" -> LongType,
        "worker_id" -> StringType, "finished_at" -> LongType),
      "errors" -> t("idx" -> LongType, "run_id" -> StringType,
        "status" -> StringType, "wall_ns" -> LongType, "n_rows" -> LongType,
        "worker_id" -> StringType, "finished_at" -> LongType,
        "error" -> StringType),
      "stage_metrics" -> t("run_id" -> StringType, "idx" -> LongType,
        "stage_order" -> IntegerType, "stage_id" -> IntegerType,
        "stage_name" -> StringType, "wall_ns" -> LongType,
        "executor_run_ns" -> LongType, "n_tasks" -> IntegerType,
        "peak_memory_bytes" -> LongType),
      "output_files" -> t("path" -> StringType, "idx" -> LongType,
        "run_id" -> StringType, "seq" -> IntegerType),
      "filter_artifacts" -> t("path" -> StringType, "idx" -> LongType,
        "run_id" -> StringType, "filter_name" -> StringType,
        "filter_order" -> IntegerType),
      "workers" -> t("worker_id" -> StringType, "run_id" -> StringType,
        "pid" -> LongType, "hostname" -> StringType,
        "invocation_id" -> StringType, "current_index" -> LongType,
        "completed_count" -> LongType, "ts" -> LongType),
      "logs" -> t("level" -> StringType, "logger_name" -> StringType,
        "message" -> StringType, "idx" -> LongType, "run_id" -> StringType,
        "ts" -> LongType, "worker_id" -> StringType))
  }

  /** Run-scoped commit-file prefix: every per-commit append tags its
    * installed file `r<md5(run_id)[0,8)>_<uuid>.parquet`. The prefix is a
    * pure function of run_id and every append carries exactly one run's
    * rows, so a single-run read can PRUNE other runs' uncompacted tail
    * files by NAME — no footer, no open, no bytes. Pruning is an
    * optimization only: the `run_id` filter stays on every read, so a
    * prefix collision (8 hex chars) merely reads extra files it then
    * filters out. Compacted bins and pre-prefix legacy commits mix runs
    * and keep non-matching names ([[tailFileRe]] can't match a UUID — 'r'
    * is not a hex digit), so they land in the always-read shared bucket;
    * post-compaction that bucket is small by construction, which is why
    * pruning only needs to cover the tail.
    */
  private[graft] def runPrefix(runId: String): String = {
    val h = java.security.MessageDigest.getInstance("MD5")
      .digest(runId.getBytes("UTF-8"))
    "r" + h.take(4).map(b => f"$b%02x").mkString + "_"
  }

  private val tailFileRe = java.util.regex.Pattern.compile("r[0-9a-f]{8}_.*")

  /** The files a single-run read must touch: the run's own tail files plus
    * every shared (compacted/legacy) file. None = prune nothing — either a
    * nested directory appeared (not a layout this ledger writes, so fall
    * back to the whole-directory read rather than risk under-reading) or
    * the selection kept every file anyway (reading the directory plans one
    * LIST instead of N per-path statuses — the cheaper shape on an object
    * store).
    */
  private[graft] def prunedFiles(fs: org.apache.hadoop.fs.FileSystem,
                                p: org.apache.hadoop.fs.Path,
                                runId: String): Option[Seq[String]] = {
    val pre = runPrefix(runId)
    val entries = fs.listStatus(p)
    if (entries.exists(_.isDirectory)) return None
    val parquet = entries.iterator.map(_.getPath.getName)
      .count(_.endsWith(".parquet"))
    val kept = entries.iterator.map(_.getPath)
      .filter { q =>
        val n = q.getName
        n.endsWith(".parquet") &&
          (!tailFileRe.matcher(n).matches() || n.startsWith(pre))
      }
      .map(_.toString).toSeq
    if (kept.size == parquet) None else Some(kept)
  }

  /** EVERY hot-path ledger-table read goes through here with the table's
    * canonical schema (see [[tableSchemas]]); an unknown table name (none
    * exist today) falls back to the mergeSchema read rather than guessing.
    * `forRun` additionally prunes other runs' tail files by name (see
    * [[runPrefix]]): a shared multi-run ledger's resume probe then costs
    * O(this run's uncompacted commits + compacted bins), not O(every run's
    * history).
    */
  private def readTable(spark: SparkSession, p: String): DataFrame =
    readTable(spark, p, None)

  private def readTable(spark: SparkSession, p: String,
                        forRun: Option[String]): DataFrame = {
    val table = p.substring(p.lastIndexOf('/') + 1)
    // ignoreMissingFiles, scoped to ledger reads: a reader whose plan
    // listed a tail file that compact() then re-binned and DELETED would
    // otherwise crash at execution (seen under the naf soak; the window
    // exists on every store). Skipping the vanished file under-reads from
    // a stale plan, which this design tolerates by construction: resume
    // decisions are at-least-once over idempotent per-index installs (a
    // missed completed row re-runs an index, never loses data) and every
    // duplicate-sensitive view resolves at read. The maintenance paths
    // that must NOT under-read (compact/reset rewrites) read their own
    // explicit snapshots under the maintenance lock, not this path.
    tableSchemas.get(table) match {
      case Some(schema) =>
        val pruned = forRun.flatMap { runId =>
          val hp = new org.apache.hadoop.fs.Path(p)
          prunedFiles(hp.getFileSystem(
            spark.sparkContext.hadoopConfiguration), hp, runId)
        }
        val rd = spark.read.schema(schema)
          .option("ignoreMissingFiles", "true")
        pruned match {
          case Some(files) if files.isEmpty =>
            spark.createDataFrame(
              spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
          case Some(files) =>
            // explicit roots are STATTED at planning — a root compact()
            // just deleted throws there, where ignoreMissingFiles does
            // not apply; fall back to the directory read (one LIST, sees
            // the post-compaction state)
            try rd.parquet(files: _*)
            catch {
              case _: org.apache.spark.sql.AnalysisException |
                  _: java.io.FileNotFoundException => rd.parquet(p)
            }
          case None => rd.parquet(p)
        }
      case None => spark.read.option("mergeSchema", "true")
        .option("ignoreMissingFiles", "true").parquet(p)
    }
  }

  /** MULTI-WRITER-safe append: stage the rows under a UUID dir, then move
    * each part file into the table under a unique name. A plain
    * `write.mode(Append)` is NOT safe under concurrent writers — every
    * Spark job committing into the same directory shares the
    * `_temporary/0` staging tree, so the first committer's cleanup deletes
    * the second's in-flight task files (the reference leans on SQLite's
    * WAL + busy_timeout for exactly this, `pipeline_store.py:758-777`).
    * Staging + rename gives each commit its own tree and an atomic (per
    * file) install — also the object-store-friendly pattern at 100 TB
    * (unique keys, no directory-level commit protocol).
    *
    * STAGE-FILE NAMING CONTRACT (shared with [[appendLocal]] and
    * [[compact]]): staged bytes live ONLY under `<dir>/_staging/<uuid>`,
    * never inside a table directory, and installs are single renames of
    * COMPLETE files to `<dir>/<table>/<uuid>.parquet`. A writer killed
    * between stage and rename therefore leaves nothing a reader or
    * `compact()` can see or trip over — only an orphan under `_staging/`,
    * which [[clean]] janitors by age.
    */
  private def appendRows(df: DataFrame, table: String, runId: String,
                         singleFile: Boolean = true): Unit = {
    val spark = df.sparkSession
    val staging = new org.apache.hadoop.fs.Path(
      s"$dir/_staging/${java.util.UUID.randomUUID()}")
    (if (singleFile) df.coalesce(1) else df)
      .write.mode(SaveMode.Overwrite).parquet(staging.toString)
    val fs = staging.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val dest = new org.apache.hadoop.fs.Path(s"$dir/$table")
    fs.mkdirs(dest)
    fs.listStatus(staging).iterator
      .filter(_.getPath.getName.endsWith(".parquet"))
      .foreach { f =>
        require(fs.rename(f.getPath, new org.apache.hadoop.fs.Path(dest,
          s"${runPrefix(runId)}${java.util.UUID.randomUUID()}.parquet")),
          s"ledger append: rename into $dest failed")
      }
    fs.delete(staging, true)
  }

  // Column types the driver-side fast path writes (all ledger tables are
  // flat rows of these three shapes; Option/null → optional field absent).
  private sealed trait ColT
  private case object LongT extends ColT
  private case object IntT extends ColT
  private case object StringT extends ColT

  private def msgType(cols: Seq[(String, ColT)]): org.apache.parquet.schema.MessageType = {
    import org.apache.parquet.schema.{LogicalTypeAnnotation, Types}
    import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName._
    val b = Types.buildMessage()
    cols.foreach { case (n, t) =>
      t match {
        case LongT => b.addField(Types.optional(INT64).named(n))
        case IntT => b.addField(Types.optional(INT32).named(n))
        case StringT => b.addField(Types.optional(BINARY)
          .as(LogicalTypeAnnotation.stringType()).named(n))
      }
    }
    b.named("spark_schema")
  }

  /** DRIVER-SIDE commit fast path: ledger rows the driver already holds
    * (one index's metrics, a heartbeat, a handful of artifact paths) are
    * written straight through parquet-mr — no Spark job — then installed
    * by the same stage-then-rename protocol as [[appendRows]]. This is
    * what keeps per-index commit latency in the reference's SQLite class
    * (~ms) instead of paying a full job-scheduling round-trip (~80 ms)
    * per table per index; at 10⁴ indices × 3 tables that difference is
    * the run. Goes through the Hadoop FileSystem API, so it works against
    * HDFS/S3 exactly like the Spark path. The distributed variant of
    * recordCompleted keeps the Spark path — its index set never lands on
    * the driver.
    */
  private def appendLocal(spark: SparkSession, table: String, runId: String,
                          cols: Seq[(String, ColT)],
                          rows: Seq[Seq[Any]]): Unit = {
    import org.apache.parquet.example.data.simple.SimpleGroup
    import org.apache.parquet.hadoop.example.ExampleParquetWriter
    import org.apache.parquet.hadoop.metadata.CompressionCodecName
    import org.apache.parquet.hadoop.util.HadoopOutputFile
    val conf = spark.sparkContext.hadoopConfiguration
    val schema = msgType(cols)
    val staging = new org.apache.hadoop.fs.Path(
      s"$dir/_staging/${java.util.UUID.randomUUID()}.parquet")
    val fs = staging.getFileSystem(conf)
    fs.mkdirs(staging.getParent)
    val writer = ExampleParquetWriter
      .builder(HadoopOutputFile.fromPath(staging, conf))
      .withConf(conf).withType(schema)
      .withCompressionCodec(CompressionCodecName.SNAPPY)
      .build()
    try rows.foreach { r =>
      val g = new SimpleGroup(schema)
      cols.zip(r).foreach { case ((n, t), v0) =>
        val v = v0 match {
          case Some(x) => x
          case None | null => null
          case x => x
        }
        if (v != null) t match {
          case LongT => g.add(n, v.asInstanceOf[Long])
          case IntT => g.add(n, v.asInstanceOf[Int])
          case StringT => g.add(n, v.asInstanceOf[String])
        }
      }
      writer.write(g)
    } finally writer.close()
    val dest = new org.apache.hadoop.fs.Path(s"$dir/$table")
    fs.mkdirs(dest)
    require(fs.rename(staging, new org.apache.hadoop.fs.Path(dest,
      s"${runPrefix(runId)}${java.util.UUID.randomUUID()}.parquet")),
      s"ledger append: rename into $dest failed")
  }

  def recordRunStart(spark: SparkSession, runId: String, configJson: String): Unit =
    recordRunStart(spark, runId, configJson, None, None)

  /** `run_dir` and `total_indices` mirror the reference's pipeline_runs
    * columns (`pipeline_store.py:540-548`): the artifact root relative
    * artifact paths resolve against, and the run's work-unit count (known
    * upfront in per-index mode; None in batch mode, where the dashboard
    * falls back to touched-index accounting exactly like
    * `dashboard/data.py:178-189`).
    */
  def recordRunStart(spark: SparkSession, runId: String, configJson: String,
                     runDir: Option[String],
                     totalIndices: Option[Long]): Unit = {
    appendLocal(spark, "runs", runId,
      Seq("run_id" -> StringT, "config_json" -> StringT,
        "started_at" -> LongT, "run_dir" -> StringT,
        "total_indices" -> LongT),
      Seq(Seq(runId, configJson, System.currentTimeMillis(),
        runDir, totalIndices)))
  }

  /** The run's recorded metadata row, latest-start wins (reruns of the
    * same config append a fresh row; the newest carries current values).
    * Returns (run_dir, total_indices) — either may be absent.
    */
  def runMeta(spark: SparkSession, runId: String): (Option[String], Option[Long]) = {
    if (!pathExists(spark, runsPath)) return (None, None)
    val df = readTable(spark, runsPath, Some(runId)).filter(col("run_id") === runId)
    val withCols = Seq("run_dir", "total_indices").foldLeft(df) { (d, c) =>
      if (d.columns.contains(c)) d else d.withColumn(c, lit(null))
    }
    val rows = withCols
      .agg(max(struct(col("started_at"),
        col("run_dir").cast("string").as("run_dir"),
        col("total_indices").cast("long").as("total_indices"))).as("m"))
      .select(col("m.run_dir"), col("m.total_indices")).collect()
    rows.headOption.map { r =>
      (Option(r.getString(0)), if (r.isNullAt(1)) None else Some(r.getLong(1)))
    }.getOrElse((None, None))
  }

  /** `is_completed` parity (`pipeline_store.py:1035-1058`): the cached
    * output paths of a completed index, None when the index has not
    * completed — the reference's skip-with-cached-outputs probe. An index
    * completed by a BATCH `runPipeline` run has its paths recorded
    * run-scoped under idx = −1 (the sink commits once for all indices), so
    * an empty per-index lookup falls back to the run-scoped set — the
    * reference contract of returning the cached outputs, not an empty list.
    */
  def isCompleted(spark: SparkSession, runId: String, idx: Long): Option[Seq[String]] = {
    val done = completedIndices(spark, runId).filter(col("idx") === idx)
      .limit(1).count() > 0
    if (!done) None
    else {
      def pathsAt(i: Long): Seq[String] = outputPathsDf(spark, runId, i)
        .select("path").collect().map(_.getString(0)).toSeq
      val perIdx = pathsAt(idx)
      Some(if (perIdx.nonEmpty) perIdx else pathsAt(-1L))
    }
  }

  /** `resolve_artifact` parity (`pipeline_store.py:1011-1033`): absolute
    * paths pass through; relative ones resolve against the recorded
    * run_dir (falling back to the path itself when no run_dir exists).
    */
  def resolveArtifact(spark: SparkSession, runId: String, p: String): String =
    if (p.startsWith("/") || p.contains("://")) p
    else runMeta(spark, runId)._1.map(d => s"$d/$p").getOrElse(p)

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
    val now = System.currentTimeMillis()
    appendLocal(spark, "index_results", runId,
      Seq("idx" -> LongT, "run_id" -> StringT, "status" -> StringT,
        "wall_ns" -> LongT, "n_rows" -> LongT,
        "peak_memory_bytes" -> LongT, "gpu_memory_bytes" -> LongT,
        "worker_id" -> StringT, "finished_at" -> LongT),
      indices.map(i => Seq(i, runId, "completed", wallNs, nRows,
        peakMemoryBytes, gpuMemoryBytes, workerId, now)))
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
    appendRows(indices.select(col("idx").cast("long"))
      .withColumn("run_id", lit(runId))
      .withColumn("status", lit("completed"))
      .withColumn("wall_ns", lit(wallNs))
      .withColumn("n_rows", lit(nRows))
      .withColumn("peak_memory_bytes", lit(peakMemoryBytes))
      .withColumn("gpu_memory_bytes",
        gpuMemoryBytes.map(lit(_)).getOrElse(lit(null)).cast("long"))
      .withColumn("worker_id", lit(workerId))
      .withColumn("finished_at", lit(System.currentTimeMillis()))
      .observe(obs, count(lit(1)).as("n")),
      "index_results", runId, singleFile = false)
    obs.get("n").asInstanceOf[Long]
  }

  /** Per-scheduler-stage wall-time rows for a run — the reference's
    * `stage_metrics` table (`pipeline_store.py:565-572`, keyed (idx,
    * run_id, stage_order); stage_name ↔ Spark's stage callsite name).
    * Batch `runPipeline` records run-scoped rows under idx = −1 (one
    * action spans every index — the documented grain divergence);
    * `runPerIndex` records the reference's exact per-index grain (each
    * index runs in its own job group, so attribution is free).
    */
  def recordStageMetrics(spark: SparkSession, runId: String,
                         stages: Seq[StageListener#StageRec]): Unit =
    recordStageMetricsIdx(spark, runId,
      stages.map(s => (-1L, s)))

  /** (idx, stage) rows batched into ONE append — `runPerIndex` collects the
    * whole run's per-index stage rows and flushes once (plus once on a
    * crash), so stage accounting never multiplies the per-index commit
    * count. stage_order restarts from 0 within each index, matching the
    * reference's per-index enumeration.
    */
  def recordStageMetricsIdx(spark: SparkSession, runId: String,
                            stages: Seq[(Long, StageListener#StageRec)]): Unit = {
    if (stages.isEmpty) return
    appendLocal(spark, "stage_metrics", runId,
      Seq("run_id" -> StringT, "idx" -> LongT, "stage_order" -> IntT,
        "stage_id" -> IntT, "stage_name" -> StringT, "wall_ns" -> LongT,
        "executor_run_ns" -> LongT, "n_tasks" -> IntT,
        "peak_memory_bytes" -> LongT),
      stages.groupBy(_._1).toSeq.flatMap { case (idx, recs) =>
        recs.map(_._2).sortBy(_.stageId).zipWithIndex.map { case (s, ord) =>
          Seq[Any](runId, idx, ord, s.stageId, s.name, s.wallNs,
            s.executorRunNs, s.nTasks, s.peakMemoryBytes)
        }
      })
  }

  /** Stage rows for a run — an empty frame WITH the table schema when none
    * were recorded, so filters/selects on the no-rows path still resolve.
    */
  def stageMetrics(spark: SparkSession, runId: String): DataFrame = {
    val p = s"$dir/stage_metrics"
    if (!pathExists(spark, p)) {
      import spark.implicits._
      Seq.empty[(String, Long, Int, Int, String, Long, Long, Int, Long)]
        .toDF("run_id", "idx", "stage_order", "stage_id", "stage_name",
          "wall_ns", "executor_run_ns", "n_tasks", "peak_memory_bytes")
    } else readTable(spark, p, Some(runId)).filter(col("run_id") === runId)
  }

  // ------------------------------------------------ provenance tables
  // The reference's `output_files(path, idx, run_id, seq)` and
  // `filter_artifacts(path, idx, run_id, filter_name, filter_order)`
  // (`core/pipeline_store.py:540-620`): which files did index i produce,
  // and which side artifacts did each filter write. Append-only parquet
  // mirrors; the (path, run_id) primary key of output_files holds because
  // the Runner records only paths not yet recorded for the run.

  /** One row per (path, seq) an index produced. Batch runs record their
    * run-scoped artifact set under idx = −1 (the sink commits once for
    * every index — documented divergence from the per-index reference).
    */
  def recordOutputFiles(spark: SparkSession, runId: String, idx: Long,
                        paths: Seq[String]): Unit = {
    if (paths.isEmpty) return
    appendLocal(spark, "output_files", runId,
      Seq("path" -> StringT, "idx" -> LongT, "run_id" -> StringT,
        "seq" -> IntT),
      paths.zipWithIndex.map { case (p, seq) => Seq[Any](p, idx, runId, seq) })
  }

  /** Side files a filter reported for an index (reference
    * `record_filter_artifacts`, `pipeline_store.py:1558-1590`).
    */
  def recordFilterArtifacts(spark: SparkSession, runId: String, idx: Long,
                            filterName: String, filterOrder: Int,
                            paths: Seq[String]): Unit = {
    if (paths.isEmpty) return
    appendLocal(spark, "filter_artifacts", runId,
      Seq("path" -> StringT, "idx" -> LongT, "run_id" -> StringT,
        "filter_name" -> StringT, "filter_order" -> IntT),
      paths.map(p => Seq[Any](p, idx, runId, filterName, filterOrder)))
  }

  /** Raw output_files rows for a run (schema-typed empty frame if none).
    *
    * The (path, run_id) PRIMARY KEY resolves at read, first-writer-wins:
    * the Runner appends only paths absent from its recorded-set snapshot,
    * but two CONCURRENT workers whose sink reports cumulative listings can
    * both pass that stale-snapshot check and append the same path — so the
    * view keeps the earliest (idx, seq) attribution per path (the "first
    * index that produced it" rule the Runner documents) instead of
    * surfacing duplicates. Single-worker ledgers are unaffected (the
    * groupBy is a no-op on already-unique paths).
    */
  def outputFiles(spark: SparkSession, runId: String): DataFrame = {
    val p = s"$dir/output_files"
    if (!pathExists(spark, p)) {
      import spark.implicits._
      Seq.empty[(String, Long, String, Int)].toDF("path", "idx", "run_id", "seq")
    } else readTable(spark, p, Some(runId)).filter(col("run_id") === runId)
      .groupBy(col("path"))
      .agg(min(struct(col("idx"), col("seq"))).as("_m"))
      .select(col("path"), col("_m.idx").as("idx"),
        lit(runId).as("run_id"), col("_m.seq").as("seq"))
  }

  /** Raw filter_artifacts rows for a run (schema-typed empty if none). */
  def filterArtifacts(spark: SparkSession, runId: String): DataFrame = {
    val p = s"$dir/filter_artifacts"
    if (!pathExists(spark, p)) {
      import spark.implicits._
      Seq.empty[(String, Long, String, String, Int)]
        .toDF("path", "idx", "run_id", "filter_name", "filter_order")
    } else readTable(spark, p, Some(runId)).filter(col("run_id") === runId)
  }

  /** `output_paths` view (`dashboard/data.py:247-262` over
    * `output_paths_for_index`): the files one index produced, seq-ordered.
    */
  def outputPathsDf(spark: SparkSession, runId: String, idx: Long): DataFrame =
    outputFiles(spark, runId).filter(col("idx") === idx)
      .select(col("seq"), col("path")).orderBy("seq")

  /** `artifacts` view (`dashboard/data.py:264-274`): one index's filter
    * artifacts, (filter_order, path)-ordered within each filter.
    */
  def artifactsDf(spark: SparkSession, runId: String, idx: Long): DataFrame =
    filterArtifacts(spark, runId).filter(col("idx") === idx)
      .select(col("filter_name"), col("filter_order"), col("path"))
      .orderBy("filter_order", "path")

  /** `all_artifacts` view (`dashboard/data.py:276-288`): every filter
    * artifact of the run, (filter_order, idx, path)-ordered.
    */
  def allArtifactsDf(spark: SparkSession, runId: String): DataFrame =
    filterArtifacts(spark, runId)
      .select(col("filter_name"), col("filter_order"), col("idx"), col("path"))
      .orderBy("filter_order", "idx", "path")

  // --------------------------------------------------- worker registry
  // The reference's `workers` table (`pipeline_store.py:540-620`,
  // register_worker/worker_start_index/worker_finish_index) as append-only
  // heartbeat rows: registration writes the first row, every commit
  // appends a refreshed one (heartbeat-on-commit — no daemon), and the
  // view resolves latest-row-wins per worker.

  /** Append one worker heartbeat row. `currentIndex` is the index whose
    * commit carries this heartbeat (None at registration / run end —
    * matching the reference's NULL between indices); `completedCount` is
    * this worker's own running commit counter (the VIEW recomputes
    * authoritative counts from index_results, like the reference's
    * `workers_df` does, so this column is informational).
    */
  def recordWorkerHeartbeat(spark: SparkSession, runId: String,
                            workerId: String, pid: Long, hostname: String,
                            invocationId: String,
                            currentIndex: Option[Long],
                            completedCount: Long): Unit =
    recordWorkerHeartbeat(spark, runId, workerId, pid, hostname,
      invocationId, currentIndex, completedCount, System.currentTimeMillis())

  /** Explicit-timestamp variant — monitors compare heartbeat ages against
    * their own clock, so writers that already read the clock (the Runner's
    * throttled stage-grain refresh) pass it through, and tests/oracles can
    * pin deterministic liveness states.
    */
  def recordWorkerHeartbeat(spark: SparkSession, runId: String,
                            workerId: String, pid: Long, hostname: String,
                            invocationId: String,
                            currentIndex: Option[Long],
                            completedCount: Long, tsMs: Long): Unit = {
    appendLocal(spark, "workers", runId,
      Seq("worker_id" -> StringT, "run_id" -> StringT, "pid" -> LongT,
        "hostname" -> StringT, "invocation_id" -> StringT,
        "current_index" -> LongT, "completed_count" -> LongT,
        "ts" -> LongT),
      Seq(Seq(workerId, runId, pid, hostname, invocationId,
        currentIndex, completedCount, tsMs)))
  }

  /** Raw workers rows for a run (schema-typed empty frame if none). */
  def workers(spark: SparkSession, runId: String): DataFrame = {
    val p = s"$dir/workers"
    if (!pathExists(spark, p)) {
      import spark.implicits._
      Seq.empty[(String, String, Long, String, String, Option[Long], Long, Long)]
        .toDF("worker_id", "run_id", "pid", "hostname", "invocation_id",
          "current_index", "completed_count", "ts")
    } else readTable(spark, p, Some(runId)).filter(col("run_id") === runId)
  }

  def recordError(spark: SparkSession, runId: String, idx: Long,
                  error: String): Unit =
    recordError(spark, runId, idx, error, "driver")

  def recordError(spark: SparkSession, runId: String, idx: Long, error: String,
                  workerId: String): Unit = {
    appendLocal(spark, "errors", runId,
      Seq("idx" -> LongT, "run_id" -> StringT, "status" -> StringT,
        "wall_ns" -> LongT, "n_rows" -> LongT, "worker_id" -> StringT,
        "finished_at" -> LongT, "error" -> StringT),
      Seq(Seq(idx, runId, "error", 0L, 0L, workerId,
        System.currentTimeMillis(), error)))
  }

  /** Structured run logs — the reference's `logs` table
    * (`pipeline_store.py:592-604`): (run_id, ts, level, logger, message,
    * idx). Batched appends: collect log rows, write once per flush, so
    * logging never becomes one-file-per-message at scale.
    */
  def recordLogs(spark: SparkSession, runId: String,
                 entries: Seq[(String, String, String, Long)]): Unit =
    recordLogs(spark, runId, entries, "driver")

  /** `workerId` tags each log row with its emitting worker (the
    * reference's `logs.worker_id`, `pipeline_store.py:592-604` — its
    * dashboard renders NULL as "Main"; here the driver session claims by
    * name, so the default is explicit).
    */
  def recordLogs(spark: SparkSession, runId: String,
                 entries: Seq[(String, String, String, Long)],
                 workerId: String): Unit = {
    if (entries.isEmpty) return
    val now = System.currentTimeMillis()
    appendLocal(spark, "logs", runId,
      Seq("level" -> StringT, "logger_name" -> StringT,
        "message" -> StringT, "idx" -> LongT, "run_id" -> StringT,
        "ts" -> LongT, "worker_id" -> StringT),
      entries.map { case (lv, lg, msg, idx) =>
        Seq[Any](lv, lg, msg, idx, runId, now, workerId) })
  }

  /** Log rows for a run — schema-typed empty frame when none were written. */
  def logs(spark: SparkSession, runId: String): DataFrame = {
    val p = s"$dir/logs"
    if (!pathExists(spark, p)) {
      import spark.implicits._
      Seq.empty[(String, String, String, Long, String, Long, String)]
        .toDF("level", "logger_name", "message", "idx", "run_id", "ts",
          "worker_id")
    } else {
      val df = readTable(spark, p, Some(runId)).filter(col("run_id") === runId)
      // Ledgers written before the worker_id column read as "driver". The
      // static table schema always injects the column (pre-column files
      // surface NULL), so the back-compat shim is per-ROW, not per-schema:
      // recordLogs never writes a null worker_id, so NULL ⇔ legacy row.
      df.withColumn("worker_id", coalesce(col("worker_id"), lit("driver")))
    }
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
    else readTable(spark, idxPath, Some(runId))
      .filter(col("run_id") === runId && col("status") === "completed")
      .select("idx").distinct()
  }

  /** Failed indices for a run (`core/base.py:858-951` failed_indices). */
  def failedIndices(spark: SparkSession, runId: String): DataFrame = {
    import spark.implicits._
    val errPath = s"$dir/errors"
    if (!pathExists(spark, errPath)) Seq.empty[Long].toDF("idx")
    else readTable(spark, errPath, Some(runId))
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
    readTable(spark, idxPath)
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
      (if (pathExists(spark, idxPath)) readTable(spark, idxPath, Some(runId))
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
      (if (pathExists(spark, errPath)) readTable(spark, errPath, Some(runId))
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
  /** `summary` without a caller-supplied total: reads the run's recorded
    * `total_indices` (per-index runs store it at start), falling back to
    * touched-index accounting exactly like `dashboard/data.py:178-189`
    * when a batch run recorded none.
    */
  def summaryDf(spark: SparkSession, runId: String): DataFrame = {
    val total = runMeta(spark, runId)._2
      .getOrElse(indexDf(spark, runId).count())
    summaryDf(spark, runId, total)
  }

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

  /** `indices_by_worker` parity (`pipeline_store.py:1200-1246`): the
    * sorted completed and failed index lists one worker owns, with the
    * same retry-wins rule as [[workersDf]] (an index another worker later
    * completed no longer counts as this worker's failure).
    */
  def indicesByWorker(spark: SparkSession, runId: String,
                      workerId: String): DataFrame = {
    import spark.implicits._
    val comp =
      (if (pathExists(spark, idxPath)) readTable(spark, idxPath, Some(runId))
         .filter(col("run_id") === runId && col("status") === "completed")
       else Seq.empty[(Long, String)].toDF("idx", "worker_id"))
        .select(col("worker_id"), col("idx").cast("long").as("idx"))
    val errPath = s"$dir/errors"
    val errs =
      (if (pathExists(spark, errPath)) readTable(spark, errPath, Some(runId))
         .filter(col("run_id") === runId)
       else Seq.empty[(Long, String)].toDF("idx", "worker_id"))
        .select(col("worker_id"), col("idx").cast("long").as("idx"))
        .join(comp.select("idx").distinct(), Seq("idx"), "left_anti")
    comp.filter(col("worker_id") === workerId)
      .select(col("idx"), lit("completed").as("status"))
      .unionByName(errs.filter(col("worker_id") === workerId)
        .select(col("idx"), lit("failed").as("status")))
      .distinct().orderBy("status", "idx")
  }

  /** Janitor for orphaned staging artifacts: a writer killed between stage
    * and rename leaves its file (or a Spark job's staged dir, possibly with
    * a `_temporary` tree inside) under `_staging/` — invisible to every
    * reader (tables read `<dir>/<table>` only, see the naming contract at
    * [[appendRows]]) but accreting forever. Removes `_staging` entries
    * older than `olderThanMs` (default 1 h — anything still mid-commit is
    * milliseconds old, so age separates orphans from in-flight commits).
    * Returns the number of entries removed. [[compact]] runs this
    * implicitly under its maintenance lock.
    */
  def clean(spark: SparkSession, olderThanMs: Long = 60L * 60 * 1000): Int = {
    val p = new org.apache.hadoop.fs.Path(s"$dir/_staging")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) 0
    else {
      val cutoff = System.currentTimeMillis() - olderThanMs
      fs.listStatus(p).iterator
        .filter(_.getModificationTime < cutoff)
        .count(f => fs.delete(f.getPath, true))
    }
  }

  /** DRIVER-SIDE compaction fast path (the [[appendLocal]] insight applied
    * to the rewrite): a fragmented ledger table is huge in FILE COUNT but
    * tiny in BYTES (one row per commit), so a Spark rewrite pays ~20k task
    * schedulings to move ~20 MB — measured 113–138 s per 20k-file table at
    * the 10⁵ decade. Reading the snapshot sequentially with parquet-mr and
    * writing one merged file is pure I/O. Schemas are UNION-merged across
    * footers (tables gain columns across versions; every ledger field is a
    * flat optional primitive) with values copied field-by-field, so the
    * fast path preserves added columns exactly like the mergeSchema read
    * path. Rows buffer in memory — callers gate this on total BYTES, which
    * for these one-row-per-commit tables is megabytes at 10⁵ commits.
    *
    * The read pass is PARALLEL across a bounded driver pool — measured at
    * 20k single-row files: sequential merge 233 s (open cost serializes),
    * Spark rewrite ~130 s, 16-thread parquet-mr merge **101 s**. The floor
    * is per-file footer-parse CPU (~80 ms·core/file in BOTH engines), so
    * the fast path's win is the removed job-scheduling overhead and
    * jitter, not I/O; the cadence knob (compact more often, fewer files
    * per pass) is the bigger lever against total maintenance cost.
    */
  private def compactLocal(conf: org.apache.hadoop.conf.Configuration,
                           files: Seq[org.apache.hadoop.fs.Path],
                           out: org.apache.hadoop.fs.Path): Unit = {
    import org.apache.parquet.example.data.Group
    import org.apache.parquet.example.data.simple.SimpleGroup
    import org.apache.parquet.hadoop.ParquetReader
    import org.apache.parquet.hadoop.example.{ExampleParquetWriter, GroupReadSupport}
    import org.apache.parquet.hadoop.metadata.CompressionCodecName
    import org.apache.parquet.hadoop.util.HadoopOutputFile
    import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName
    import org.apache.parquet.schema.{LogicalTypeAnnotation, Types}
    // pass 1: read every file on a bounded pool (open cost dominates)
    def readFile(f: org.apache.hadoop.fs.Path): Vector[Group] = {
      val reader = ParquetReader
        .builder(new GroupReadSupport(), f).withConf(conf).build()
      try {
        val b = Vector.newBuilder[Group]
        var g = reader.read()
        while (g != null) { b += g; g = reader.read() }
        b.result()
      } finally reader.close()
    }
    val pool = java.util.concurrent.Executors.newFixedThreadPool(16)
    val perFile =
      try {
        val futures = files.map(f => pool.submit(
          new java.util.concurrent.Callable[Vector[Group]] {
            override def call(): Vector[Group] = readFile(f)
          }))
        futures.map(_.get())
      } finally pool.shutdown()
    val fieldOrder = scala.collection.mutable.LinkedHashMap
      .empty[String, org.apache.parquet.schema.PrimitiveType]
    val rows = Seq.newBuilder[Group]
    perFile.foreach { fileRows =>
      fileRows.headOption.foreach { g =>
        g.getType.getFields.forEach { fld =>
          require(fld.isPrimitive,
            s"ledger compaction fast path: non-primitive field $fld")
          if (!fieldOrder.contains(fld.getName))
            fieldOrder += fld.getName -> fld.asPrimitiveType()
        }
      }
      rows ++= fileRows
    }
    val b = Types.buildMessage()
    fieldOrder.foreach { case (n, pt) =>
      b.addField(Types.optional(pt.getPrimitiveTypeName)
        .as(pt.getLogicalTypeAnnotation).named(n))
    }
    val schema = b.named("spark_schema")
    val writer = ExampleParquetWriter
      .builder(HadoopOutputFile.fromPath(out, conf))
      .withConf(conf).withType(schema)
      .withCompressionCodec(CompressionCodecName.SNAPPY)
      .build()
    try rows.result().foreach { g =>
      val o = new SimpleGroup(schema)
      fieldOrder.foreach { case (n, pt) =>
        val has = g.getType.containsField(n) &&
          g.getFieldRepetitionCount(n) > 0
        if (has) pt.getPrimitiveTypeName match {
          case PrimitiveTypeName.INT64 => o.add(n, g.getLong(n, 0))
          case PrimitiveTypeName.INT32 => o.add(n, g.getInteger(n, 0))
          case PrimitiveTypeName.BINARY |
               PrimitiveTypeName.FIXED_LEN_BYTE_ARRAY =>
            o.add(n, g.getBinary(n, 0))
          case PrimitiveTypeName.DOUBLE => o.add(n, g.getDouble(n, 0))
          case PrimitiveTypeName.FLOAT => o.add(n, g.getFloat(n, 0))
          case PrimitiveTypeName.BOOLEAN => o.add(n, g.getBoolean(n, 0))
          case other =>
            throw new IllegalStateException(
              s"ledger compaction fast path: unsupported type $other for $n")
        }
      }
      writer.write(o)
    } finally writer.close()
  }

  /** Ledger small-files compaction — the scale discipline the ledger's OWN
    * metadata needs: per-index commits append one tiny parquet file each,
    * so a 10⁴–10⁵-index `runPerIndex` run turns every resume probe into a
    * 10⁴–10⁵-footer listing (the reference's SQLite WAL has no analogue of
    * this cost). `compact` rewrites any table whose file count exceeds
    * `maxFilesPerTable` into size-targeted files (64 MB apiece, minimum
    * one). Contents are unchanged — the tables are append-only row logs,
    * so a rewrite is a pure physical re-bin.
    *
    * CONCURRENCY CONTRACT (r13 — the r12 form documented "quiesce first"
    * without enforcing it; the reference dedicates WAL + busy_timeout to
    * exactly this class, `pipeline_store.py:758-777`):
    *
    *  - ONE COMPACTOR AT A TIME, enforced: an atomic create-exclusive
    *    maintenance lock at `<dir>/_maintenance/compact.lock` (the same
    *    NIO-for-`file://` / `create(overwrite=false)`-for-HDFS split as
    *    the Runner's index claims). A second concurrent `compact` throws
    *    `IllegalStateException`. A lock older than `lockTtlMs` is treated
    *    as a crashed compactor's and broken.
    *  - RACING COMMITTERS LOSE NOTHING, structurally: each table's rewrite
    *    SNAPSHOTS the exact parquet file set, reads only those files,
    *    installs the compacted files INTO the live table dir under fresh
    *    UUID names, then deletes exactly the snapshot. Commits are pure
    *    file ADDS (see [[appendRows]]), so there is no retired directory a
    *    racing stage-then-rename commit could land in — a concurrent
    *    commit's file is neither read nor deleted and simply survives.
    *  - Readers overlapping the install→delete window may transiently see
    *    a row both in its original file and in the compacted one. Every
    *    resolve-at-read view tolerates duplicates by construction
    *    (`completedIndices` is distinct, `indexDf`/`workersDf`/`runMeta`
    *    resolve latest-wins via max-struct, `outputFiles` first-wins);
    *    only raw-count dashboards can transiently over-count during an
    *    overlapping maintenance window.
    *
    * Returns table → (files before, files after) for every table present.
    */
  /** `smallTableBytes` gates the DRIVER-SIDE rewrite ([[compactLocal]]):
    * a table whose snapshot totals at most this many bytes is merged
    * sequentially with parquet-mr into one file (rows buffer in memory —
    * these are one-row-per-commit tables, megabytes at 10⁵ commits)
    * instead of paying one Spark task per tiny file; measured 113–138 s →
    * single-digit seconds per 20k-file table. Pass 0 to force the Spark
    * path (large or externally-written tables take it automatically).
    */
  /** ONE maintenance lock serializes every destructive table rewrite —
    * compact() AND the reset family — against each other (two concurrent
    * rewrites could re-install each other's deleted snapshots). Stale-lock
    * break is CRASH-RECOVERY, not normal mutual exclusion: a live holder
    * releases in `finally`, so a lock older than the TTL means a killed
    * process. The status read tolerates the lock vanishing underneath it
    * (a racing holder's release), and the break itself is best-effort: two
    * processes both breaking a stale lock in the same instant can at worst
    * DUPLICATE rows (both install their rewritten copy), never lose them —
    * and every resolve-at-read view tolerates duplicates.
    */
  private[graft] def withMaintenanceLock[A](spark: SparkSession, what: String,
                                            lockTtlMs: Long)(body: => A): A = {
    val fsConf = spark.sparkContext.hadoopConfiguration
    val lock = new org.apache.hadoop.fs.Path(s"$dir/_maintenance/compact.lock")
    val lfs = lock.getFileSystem(fsConf)
    lfs.mkdirs(lock.getParent)
    // Per-store exclusion primitive (LockProvider): create-exclusive on
    // file/HDFS, fencing-token lease on stores configured
    // `graft.lock.provider.<scheme>=lease`. Stale-break (TTL) lives in
    // the provider.
    val lp = LockProvider.forFs(lfs)
    if (!lp.tryAcquire(lfs, lock, lockTtlMs))
      throw new IllegalStateException(
        s"ledger maintenance already in progress — $what refused " +
          s"(maintenance lock $lock; locks older than $lockTtlMs ms are " +
          "broken as stale)")
    // RENEWAL: a rewrite that outlives the TTL (a 100 TB-class ledger's
    // compaction) must not have its lock stale-broken mid-install by a
    // rival maintainer — a live holder refreshes at TTL/4 from a daemon
    // thread, so staleness again means exactly "crashed holder". A FAILED
    // renew means the lock is no longer ours (lease stolen, or broken
    // after a pause past the TTL): record the loss and stop renewing —
    // the destructive phases fence on it (checkFence below) and abort
    // rather than rewrite/delete without exclusion.
    val lost = new java.util.concurrent.atomic.AtomicBoolean(false)
    val renewer = new Thread(() => {
      val period = math.max(lockTtlMs / 4, 250L)
      try {
        var ours = true
        while (ours && !Thread.interrupted()) {
          Thread.sleep(period)
          // interrupt = the release path, not a fence loss; don't renew
          // a lease release is about to delete
          if (!Thread.currentThread().isInterrupted &&
              !lp.renew(lfs, lock)) {
            lost.set(true)
            ours = false
          }
        }
      } catch { case _: InterruptedException => () }
    }, "graft-maintenance-lock-renewer")
    renewer.setDaemon(true)
    renewer.start()
    // Resource fence for the body's destructive phases: before every
    // install/unlink, checkFence() re-verifies the lock is still OURS
    // (renewer flag + a token read through the provider), so a holder
    // whose lease was stolen aborts with its staged output orphaned for
    // clean() instead of deleting rows a rival maintainer now owns.
    Ledger.fence.set(() =>
      if (lost.get() || !lp.verify(lfs, lock))
        throw new IllegalStateException(
          s"maintenance lock $lock lost mid-$what (lease stolen or renew " +
            "failed) — aborting before the destructive phase; staged " +
            "output is orphaned for clean()"))
    try body finally {
      Ledger.fence.remove()
      renewer.interrupt()
      // JOIN before release: a renew already past its token check could
      // otherwise re-PUT the lease after release deletes it, leaving an
      // orphan lock that refuses all maintenance until the TTL expires
      renewer.join()
      lp.release(lfs, lock)
    }
  }

  /** Fence gate for destructive maintenance phases (see
    * [[withMaintenanceLock]]): throws when the maintenance lock is no
    * longer this holder's; no-op outside a maintenance-lock scope.
    */
  private[graft] def checkFence(): Unit = {
    val g = Ledger.fence.get()
    if (g != null) g()
  }

  /** The ledger's table directories, the compaction/maintenance universe. */
  private val allTables = Seq("index_results", "runs", "errors", "logs",
    "stage_metrics", "output_files", "filter_artifacts", "workers")

  /** Auto-compaction policy: compact ONLY when some table's file count
    * exceeds `maxFilesPerTable`, checked with one LIST per table BEFORE
    * taking any lock — the steady-state call (nothing over threshold) is
    * lock-free and job-free, so a runner can invoke this on every commit
    * boundary without contending with live maintainers. When a rewrite is
    * due it runs the normal [[compact]] under the maintenance lock,
    * REFUSING (None) rather than blocking or throwing if another
    * maintainer holds it — whoever holds the lock is doing the work this
    * call wanted done.
    *
    * Returns None = refused (locked); Some(empty) = nothing over
    * threshold; Some(report) = compacted.
    */
  def maintainIfNeeded(spark: SparkSession, maxFilesPerTable: Int = 64,
                       lockTtlMs: Long = 60L * 60 * 1000)
      : Option[Map[String, (Int, Int)]] = {
    val fsConf = spark.sparkContext.hadoopConfiguration
    val over = allTables.exists { t =>
      val p = new org.apache.hadoop.fs.Path(s"$dir/$t")
      val fs = p.getFileSystem(fsConf)
      fs.exists(p) && fs.listStatus(p).count { s =>
        s.isFile && s.getPath.getName.endsWith(".parquet")
      } > maxFilesPerTable
    }
    if (!over) Some(Map.empty)
    else
      try Some(compact(spark, maxFilesPerTable, lockTtlMs))
      catch {
        case e: IllegalStateException
            if e.getMessage.contains("already in progress") => None
      }
  }

  def compact(spark: SparkSession, maxFilesPerTable: Int = 64,
              lockTtlMs: Long = 60L * 60 * 1000,
              smallTableBytes: Long = 64L << 20): Map[String, (Int, Int)] = {
    val fsConf = spark.sparkContext.hadoopConfiguration
    withMaintenanceLock(spark, "compact", lockTtlMs) {
      clean(spark) // janitor staging orphans while we hold the lock
      val tables = allTables
      tables.flatMap { t =>
        val p = new org.apache.hadoop.fs.Path(s"$dir/$t")
        val fs = p.getFileSystem(fsConf)
        if (!fs.exists(p)) None
        else {
          // SNAPSHOT: the rewrite reads exactly these files and later
          // deletes exactly these files — nothing else
          val snap = {
            val it = fs.listFiles(p, true)
            val b = Seq.newBuilder[org.apache.hadoop.fs.LocatedFileStatus]
            while (it.hasNext) {
              val f = it.next()
              if (f.getPath.getName.endsWith(".parquet")) b += f
            }
            b.result()
          }
          val nFiles = snap.size
          if (nFiles <= maxFilesPerTable) Some(t -> (nFiles, nFiles))
          else {
            val nBytes = snap.map(_.getLen).sum
            val target = math.max(1L, nBytes / (64L << 20)).toInt
            val tmp = new org.apache.hadoop.fs.Path(
              s"$dir/_staging/compact_${java.util.UUID.randomUUID()}")
            if (nBytes <= smallTableBytes) {
              // driver fast path: sequential parquet-mr merge, one file
              fs.mkdirs(tmp)
              compactLocal(fsConf, snap.map(_.getPath),
                new org.apache.hadoop.fs.Path(tmp, "merged.parquet"))
            } else spark.read.option("mergeSchema", "true")
              .parquet(snap.map(_.getPath.toString): _*)
              .coalesce(target)
              .write.mode(SaveMode.Overwrite).parquet(tmp.toString)
            // install compacted files into the LIVE dir, then drop the
            // snapshot; concurrent commits are adds and survive both steps.
            // Fence first: if the lock was stolen mid-rewrite, abort here
            // with the staged output orphaned for clean() — installing and
            // deleting without exclusion could race a rival's rewrite.
            checkFence()
            fs.listStatus(tmp).iterator
              .filter(_.getPath.getName.endsWith(".parquet"))
              .foreach { f =>
                require(fs.rename(f.getPath, new org.apache.hadoop.fs.Path(p,
                  s"${java.util.UUID.randomUUID()}.parquet")),
                  s"compact: install into $p failed")
              }
            fs.delete(tmp, true)
            checkFence() // fence again before the snapshot unlinks
            snap.foreach(f => fs.delete(f.getPath, false))
            val after = {
              val it = fs.listFiles(p, true)
              var m = 0
              while (it.hasNext) {
                if (it.next().getPath.getName.endsWith(".parquet")) m += 1
              }
              m
            }
            Some(t -> (nFiles, after))
          }
        }
      }.toMap
    }
  }

  // ------------------------------------------------------- reset family
  // The reference's destructive store edits (`pipeline_store.py:1455-1508`):
  // `reset()` clears every record of a run (filter_artifacts, output_files,
  // stage_metrics, index_results, workers, pipeline_runs — logs are KEPT,
  // matching the reference), `reset_index(i)` clears one index's records so
  // a resume re-runs it from scratch. In an append-only parquet ledger a
  // row delete is a rewrite — but the per-run commit-file prefix makes the
  // common case cheap: a run's own TAIL files contain only that run's rows,
  // so resetRun deletes them outright; only SHARED files (compacted bins,
  // legacy names) need the read-filter-rewrite, and only when they actually
  // hold the run's rows. Both take the maintenance lock (they are
  // destructive rewrites racing compact() and each other) and clear the
  // run's claim namespaces so a resumed invocation re-claims reset indices.

  /** Names of the candidate files whose parquet footer statistics PROVE
    * every row belongs to `runId`: each `run_id` column chunk must show
    * min = max = runId with zero nulls. The proof needs no registration
    * assumption (any writer's file speaks for itself through its own
    * footer) and costs footer-sized IO per file. Missing, truncated, or
    * unreadable stats fail the proof and fall to the read-filter-rewrite
    * path — never wrong, at worst slower; run_id strings sit far below
    * parquet's 64-byte stat-truncation threshold in every entry point.
    * Large tails fan the footer reads out as one Spark job (the 10⁴-commit
    * reset shape); small ones stay a driver loop.
    */
  private def provablyExclusive(spark: SparkSession,
                                fs: org.apache.hadoop.fs.FileSystem,
                                files: Seq[org.apache.hadoop.fs.Path],
                                runId: String): Set[String] = {
    def proof(pfs: org.apache.hadoop.fs.FileSystem,
              f: org.apache.hadoop.fs.Path): Boolean =
      try {
        val chunks = graft.sources.ParquetFooter.parseFooter(
          graft.sources.ParquetFooter.readFooterBytes(pfs, f))
          .filter(_.column == "run_id")
        chunks.nonEmpty && chunks.forall(c =>
          c.nullCount.contains(0L) && c.minV.contains(runId) &&
            c.maxV.contains(runId))
      } catch { case _: Exception => false }
    if (files.size <= 64)
      files.iterator.filter(proof(fs, _)).map(_.getName).toSet
    else {
      import org.apache.spark.sql.Encoders
      val conf = new org.apache.spark.util.SerializableConfiguration(
        spark.sparkContext.hadoopConfiguration)
      spark.createDataset(files.map(_.toString))(Encoders.STRING)
        .mapPartitions { it =>
          it.filter { s =>
            val p = new org.apache.hadoop.fs.Path(s)
            proof(p.getFileSystem(conf.value), p)
          }.map(s => new org.apache.hadoop.fs.Path(s).getName)
        }(Encoders.STRING)
        .collect().toSet // names only — bounded by the candidate tail
    }
  }

  /** Snapshot of a table's parquet files split into (this run's tail files,
    * shared files); other runs' tail files are never touched.
    */
  private def splitSnapshot(fs: org.apache.hadoop.fs.FileSystem,
                            p: org.apache.hadoop.fs.Path, runId: String)
      : (Seq[org.apache.hadoop.fs.Path], Seq[org.apache.hadoop.fs.Path]) = {
    val pre = runPrefix(runId)
    val all = fs.listStatus(p).iterator.map(_.getPath)
      .filter(_.getName.endsWith(".parquet")).toSeq
    (all.filter(_.getName.startsWith(pre)),
      all.filter(q => !tailFileRe.matcher(q.getName).matches()))
  }

  /** Rewrite `shared` without the rows matching `drop`, installing under
    * plain (shared-bucket) names; no-op when no shared file holds such
    * rows. mergeSchema read — a maintenance pass, like compact's.
    *
    * NULL discipline: legacy mixed-ledger rows may lack a column the
    * predicate references (e.g. pre-idx stage_metrics), making `drop`
    * evaluate to NULL — or the whole selected file set may lack the
    * column, making the predicate unresolvable. A destructive rewrite
    * must treat both as "not dropped": missing canonical columns are
    * padded with NULL so the predicate resolves, `!NULL` is NULL and a
    * bare `filter(!drop)` would silently delete those rows, so the
    * trigger check and the kept set both coalesce the predicate, and the
    * kept rows are written back with their ORIGINAL columns only.
    */
  private def rewriteSharedWithout(spark: SparkSession,
                                   fs: org.apache.hadoop.fs.FileSystem,
                                   p: org.apache.hadoop.fs.Path,
                                   shared: Seq[org.apache.hadoop.fs.Path],
                                   drop: Column): Unit = {
    if (shared.isEmpty) return
    val raw = spark.read.option("mergeSchema", "true")
      .parquet(shared.map(_.toString): _*)
    val df = tableSchemas.get(p.getName) match {
      case Some(sc) => sc.fields.foldLeft(raw)((d, f) =>
        if (d.columns.contains(f.name)) d
        else d.withColumn(f.name, lit(null).cast(f.dataType)))
      case None => raw
    }
    if (df.filter(coalesce(drop, lit(false))).isEmpty) return
    val keep = df.filter(coalesce(!drop, lit(true)))
      .select(raw.columns.map(col).toIndexedSeq: _*)
    val tmp = new org.apache.hadoop.fs.Path(
      s"$dir/_staging/reset_${java.util.UUID.randomUUID()}")
    keep.coalesce(1).write.mode(SaveMode.Overwrite).parquet(tmp.toString)
    checkFence() // abort before install/unlink if the lock was stolen
    fs.listStatus(tmp).iterator
      .filter(_.getPath.getName.endsWith(".parquet"))
      .foreach { f =>
        require(fs.rename(f.getPath, new org.apache.hadoop.fs.Path(p,
          s"${java.util.UUID.randomUUID()}.parquet")),
          s"reset: install into $p failed")
      }
    fs.delete(tmp, true)
    shared.foreach(f => fs.delete(f, false))
  }

  /** Reference `reset()` (`pipeline_store.py:1455-1477`): clear every
    * record of `runId` (logs kept). Divergence, documented: the reference
    * re-registers the run inside reset; here registration happens at the
    * next `recordRunStart`, which every Runner entry point already calls.
    * Returns table → files deleted outright (the run's own tail).
    */
  def resetRun(spark: SparkSession, runId: String,
               lockTtlMs: Long = 60L * 60 * 1000): Map[String, Int] =
    withMaintenanceLock(spark, s"resetRun($runId)", lockTtlMs) {
      val fsConf = spark.sparkContext.hadoopConfiguration
      val tables = Seq("filter_artifacts", "output_files", "stage_metrics",
        "index_results", "errors", "workers", "runs")
      val report = tables.map { t =>
        val p = new org.apache.hadoop.fs.Path(s"$dir/$t")
        val fs = p.getFileSystem(fsConf)
        if (!fs.exists(p)) t -> 0
        else {
          val (mine, shared) = splitSnapshot(fs, p, runId)
          // The name-prefix match is only 8 hex chars of MD5 — fine on the
          // read path (the run_id filter stays on), but an outright unlink
          // must not trust it: a prefix COLLISION between two run_ids would
          // delete another run's commits. Exclusivity is proven per file
          // from PARQUET FOOTER STATISTICS (see [[provablyExclusive]]) —
          // no registration assumption at all (the r14 runs-table check
          // was blind to writers that never called recordRunStart), at
          // footer-sized IO per candidate tail file.
          val provable = provablyExclusive(spark, fs, mine, runId)
          val (clean, dirty) =
            mine.partition(f => provable.contains(f.getName))
          checkFence() // abort before the unlinks if the lock was stolen
          clean.foreach(f => fs.delete(f, false)) // provably only this run's rows
          rewriteSharedWithout(spark, fs, p, dirty,
            col("run_id") === runId)
          rewriteSharedWithout(spark, fs, p, shared, col("run_id") === runId)
          t -> clean.size
        }
      }.toMap
      val claims = new org.apache.hadoop.fs.Path(s"$dir/claims/$runId")
      val cfs = claims.getFileSystem(fsConf)
      if (cfs.exists(claims)) cfs.delete(claims, true)
      report
    }

  /** Rewrite one table without the rows matching `drop`, touching only
    * `runId`'s own tail files and the shared bucket: surviving tail rows
    * are re-installed UNDER THE RUN'S PREFIX (so per-run pruning keeps
    * working after the rewrite); other runs' tail files are never read.
    * Caller holds the maintenance lock.
    */
  private def rewriteRunWithout(spark: SparkSession, table: String,
                                runId: String, drop: Column): Unit = {
    val fsConf = spark.sparkContext.hadoopConfiguration
    val p = new org.apache.hadoop.fs.Path(s"$dir/$table")
    val fs = p.getFileSystem(fsConf)
    if (!fs.exists(p)) return
    val (mine, shared) = splitSnapshot(fs, p, runId)
    if (mine.nonEmpty) {
      val raw = spark.read.option("mergeSchema", "true")
        .parquet(mine.map(_.toString): _*)
      // same NULL discipline as rewriteSharedWithout: a row or file the
      // predicate can't see (missing column → NULL/unresolvable) is KEPT
      val df = tableSchemas.get(table) match {
        case Some(sc) => sc.fields.foldLeft(raw)((d, f) =>
          if (d.columns.contains(f.name)) d
          else d.withColumn(f.name, lit(null).cast(f.dataType)))
        case None => raw
      }
      if (!df.filter(coalesce(drop, lit(false))).isEmpty) {
        val keep = df.filter(coalesce(!drop, lit(true)))
          .select(raw.columns.map(col).toIndexedSeq: _*)
        val tmp = new org.apache.hadoop.fs.Path(
          s"$dir/_staging/reset_${java.util.UUID.randomUUID()}")
        keep.coalesce(1).write.mode(SaveMode.Overwrite)
          .parquet(tmp.toString)
        checkFence() // abort before install/unlink if the lock was stolen
        fs.listStatus(tmp).iterator
          .filter(_.getPath.getName.endsWith(".parquet"))
          .foreach { f =>
            require(fs.rename(f.getPath,
              new org.apache.hadoop.fs.Path(p,
                s"${runPrefix(runId)}${java.util.UUID.randomUUID()}.parquet")),
              s"rewrite: install into $p failed")
          }
        fs.delete(tmp, true)
        mine.foreach(f => fs.delete(f, false))
      }
    }
    rewriteSharedWithout(spark, fs, p, shared, drop)
  }

  /** Reference `reset_index(i)` (`pipeline_store.py:1478-1508`): clear one
    * index's records (filter_artifacts, output_files, stage_metrics,
    * index_results — plus our split-out errors table, whose rows live in
    * index_results in the reference) so a resume re-runs exactly that
    * index.
    */
  def resetIndex(spark: SparkSession, runId: String, idx: Long,
                 lockTtlMs: Long = 60L * 60 * 1000): Unit =
    withMaintenanceLock(spark, s"resetIndex($runId, $idx)", lockTtlMs) {
      val drop = col("run_id") === runId && col("idx") === idx
      Seq("filter_artifacts", "output_files", "stage_metrics",
        "index_results", "errors")
        .foreach(rewriteRunWithout(spark, _, runId, drop))
      // drop the index's claim files in every invocation namespace, so a
      // resumed invocation re-claims it
      val claims = new org.apache.hadoop.fs.Path(s"$dir/claims/$runId")
      val cfs = claims.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (cfs.exists(claims)) {
        cfs.listStatus(claims).iterator.filter(_.isDirectory).foreach { inv =>
          val c = new org.apache.hadoop.fs.Path(inv.getPath, s"idx_$idx")
          if (cfs.exists(c)) cfs.delete(c, false)
        }
      }
    }

  /** Reference `index_for_path` (`pipeline_store.py:1510-1531`): which
    * source index produced this output file — the reverse lookup over the
    * (path, run_id)-resolved output_files view.
    */
  def indexForPath(spark: SparkSession, runId: String,
                   path: String): Option[Long] =
    outputFiles(spark, runId).filter(col("path") === path)
      .select("idx").collect().headOption.map(_.getLong(0))

  /** Reference `replace_filter_artifacts` (`pipeline_store.py:1593-1635`):
    * after a shard-merge (`gather_pipeline`), drop the shard artifact rows
    * and record ONE merged row at the reference's representative idx = 0 —
    * the dashboard then points at the final merged file. Both steps run
    * INSIDE one maintenance-lock hold, insert-first: the reference does
    * delete+insert in a single SQLite transaction, and the closest
    * crash-safe analogue here is append-then-rewrite — a crash between
    * the steps leaves shard rows AND the merged row (a recoverable
    * superset a re-invocation collapses), never the neither-state a
    * delete-then-unlocked-insert ordering would expose to concurrent
    * readers.
    */
  def replaceFilterArtifacts(spark: SparkSession, runId: String,
                             filterName: String, filterOrder: Int,
                             oldPaths: Seq[String], mergedPath: String,
                             lockTtlMs: Long = 60L * 60 * 1000): Unit =
    withMaintenanceLock(spark, s"replaceFilterArtifacts($runId)", lockTtlMs) {
      // insert-if-absent keeps a retry of the same merge (after a crash
      // between the two steps) from stacking duplicate merged rows
      val already = filterArtifacts(spark, runId)
        .filter(col("path") === mergedPath &&
          col("filter_name") === filterName)
        .limit(1).count() > 0
      if (!already)
        recordFilterArtifacts(spark, runId, 0L, filterName, filterOrder,
          Seq(mergedPath))
      if (oldPaths.nonEmpty)
        rewriteRunWithout(spark, "filter_artifacts", runId,
          col("run_id") === runId && col("path").isin(oldPaths: _*) &&
            col("path") =!= mergedPath)
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
      .select(col("ts"), col("level"), col("level_num"), col("worker_id"),
        col("idx"), col("logger_name"), col("message"))

  /** `workers_df` parity (`dashboard/data.py:192-246` +
    * `indices_by_worker`/`active_workers`, `pipeline_store.py:1200-1246,
    * 1760-1810`): one row per claiming worker with the reference's full
    * column set — identity (`pid`, `hostname`, `invocation_id`), liveness
    * (`started_at` = first heartbeat, `last_heartbeat` = latest,
    * `current_index` from the latest row), and completed/failed counts
    * recomputed from index_results exactly as the reference's view does
    * (it drops the workers table's stale `completed_count` in favor of the
    * authoritative per-index rows). Workers that committed index rows
    * before the heartbeat registry existed (or the batch driver claim)
    * still surface, with null identity fields. Concurrent sessions sharing
    * a ledger each appear as their own worker row.
    */
  def workersDf(spark: SparkSession, runId: String): DataFrame = {
    import spark.implicits._
    val compRows =
      (if (pathExists(spark, idxPath)) readTable(spark, idxPath, Some(runId))
         .filter(col("run_id") === runId && col("status") === "completed")
       else Seq.empty[(Long, String)].toDF("idx", "worker_id"))
        .select(col("worker_id"), col("idx").cast("long").as("idx"))
    val errPath = s"$dir/errors"
    val errRows =
      (if (pathExists(spark, errPath)) readTable(spark, errPath, Some(runId))
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
    // latest-row-wins identity/liveness from the heartbeat registry
    val reg = workers(spark, runId)
      .groupBy("worker_id")
      .agg(min(col("ts")).as("started_at"),
        max(col("ts")).as("last_heartbeat"),
        max(struct(col("ts"), col("pid"), col("hostname"),
          col("current_index"), col("invocation_id"))).as("w"))
      .select(col("worker_id"), col("w.pid").as("pid"),
        col("w.hostname").as("hostname"), col("started_at"),
        col("last_heartbeat"), col("w.current_index").as("current_index"),
        col("w.invocation_id").as("invocation_id"))
    comp.join(errs, Seq("worker_id"), "full_outer")
      .join(reg, Seq("worker_id"), "full_outer")
      .select(col("worker_id"), col("pid"), col("hostname"),
        col("started_at"), col("last_heartbeat"), col("current_index"),
        col("invocation_id"),
        coalesce(col("completed"), lit(0L)).as("completed"),
        coalesce(col("failed"), lit(0L)).as("failed"))
  }

  /** STALL DETECTOR (the data core of the reference's live progress
    * monitor, `run/progress_monitor.py`): workers whose LATEST heartbeat
    * carries a `current_index` — i.e. they hold a claim mid-index — but is
    * older than `stallThresholdMs` at `nowMs`. A worker that finished
    * cleanly heartbeats with current_index = NULL at run end, so it never
    * surfaces here no matter how old its last row; a crashed or hung
    * claimant keeps its index attached to a heartbeat that stops
    * refreshing, which is exactly the signature this filters for. `nowMs`
    * is a parameter (no wall-clock read inside the view) so monitors
    * evaluate staleness against their own clock and tests stay
    * deterministic.
    */
  def stalledWorkersDf(spark: SparkSession, runId: String,
                       stallThresholdMs: Long, nowMs: Long): DataFrame =
    workersDf(spark, runId)
      .filter(col("current_index").isNotNull &&
        col("last_heartbeat") < lit(nowMs - stallThresholdMs))
      .select(col("worker_id"), col("current_index"), col("last_heartbeat"),
        (lit(nowMs) - col("last_heartbeat")).as("stalled_ms"))

  /** `progress` view — one row of run liveness (the numbers
    * `run/progress_monitor.py` / `run/progress_app.py` poll from the
    * store): the summary counters, per-run THROUGHPUT in indices/min
    * (completed count over the span from the run's recorded `started_at`
    * to the newest completion — both ledger timestamps, so the view is a
    * pure function of the tables), an ETA for the remainder at that rate
    * (null until throughput exists), and the stall detector's counts.
    * Heartbeats refresh on every commit AND — throttled — on every
    * scheduler-stage completion inside a long-running index (the Runner's
    * stage-grain refresh), so a stalled worker means genuinely no forward
    * progress, not just a slow index.
    */
  def progressDf(spark: SparkSession, runId: String,
                 stallThresholdMs: Long, nowMs: Long): DataFrame = {
    val sm = summaryDf(spark, runId).collect()(0)
    val (total, completed, failed, remaining) =
      (sm.getAs[Long]("total"), sm.getAs[Long]("completed"),
        sm.getAs[Long]("failed"), sm.getAs[Long]("remaining"))
    val startedAt: Option[Long] =
      if (!pathExists(spark, runsPath)) None
      else readTable(spark, runsPath, Some(runId)).filter(col("run_id") === runId)
        .agg(min("started_at")).collect().headOption
        .filterNot(_.isNullAt(0)).map(_.getLong(0))
    val lastFinished: Option[Long] =
      if (!pathExists(spark, idxPath)) None
      else readTable(spark, idxPath, Some(runId))
        .filter(col("run_id") === runId && col("status") === "completed")
        .agg(max("finished_at")).collect().headOption
        .filterNot(_.isNullAt(0)).map(_.getLong(0))
    val throughputPerMin: Option[Double] = for {
      s <- startedAt; f <- lastFinished if completed > 0
    } yield completed * 60000.0 / math.max(f - s, 1L)
    val etaS: Option[Double] =
      throughputPerMin.filter(_ > 0).map(t => remaining * 60.0 / t)
    val st = stalledWorkersDf(spark, runId, stallThresholdMs, nowMs)
      .agg(count(lit(1)).as("n"), min("worker_id").as("w")).collect()(0)
    val nWorkers = workersDf(spark, runId).count()
    import spark.implicits._
    Seq((total, completed, failed, remaining,
      throughputPerMin.getOrElse(Double.NaN), etaS.getOrElse(Double.NaN),
      nWorkers, st.getLong(0), Option(st.getString(1)).getOrElse("")))
      .toDF("total", "completed", "failed", "remaining",
        "throughput_per_min", "eta_s", "n_workers", "n_stalled",
        "first_stalled_worker")
  }
}

object Ledger {
  /** Per-thread fence installed by [[Ledger.withMaintenanceLock]] for the
    * duration of a maintenance body; destructive phases consult it via
    * `checkFence()`. Thread-local because maintenance bodies run on the
    * calling thread and two ledgers may maintain concurrently.
    */
  private val fence = new ThreadLocal[() => Unit]
}
