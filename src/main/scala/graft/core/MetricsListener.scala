package graft.core

import scala.collection.mutable

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

/** Per-action timing collector (the reference's `_TimedGenerator` stage
  * metrics, `core/pipeline_store.py:341-393`, re-expressed on Spark's own
  * instrumentation): every completed action records (action, wall ns,
  * observed row metrics) and can be appended to the Ledger's metrics tables.
  */
final class MetricsListener extends QueryExecutionListener {
  final case class Record(action: String, durationNs: Long,
                          observed: Map[String, String], error: Option[String])

  private val buf = mutable.ArrayBuffer.empty[Record]

  override def onSuccess(funcName: String, qe: QueryExecution, durationNs: Long): Unit =
    buf.synchronized {
      val obs = qe.observedMetrics.map { case (k, row) => k -> row.toString }
      buf += Record(funcName, durationNs, obs.toMap, None)
    }

  override def onFailure(funcName: String, qe: QueryExecution, exception: Exception): Unit =
    buf.synchronized {
      buf += Record(funcName, 0L, Map.empty, Some(exception.getMessage))
    }

  def records: Seq[Record] = buf.synchronized(buf.toVector)
  def clear(): Unit = buf.synchronized(buf.clear())
}

object MetricsListener {
  /** Attach a fresh listener; caller detaches with `spark.listenerManager
    * .unregister` when done.
    */
  def attach(spark: SparkSession): MetricsListener = {
    val l = new MetricsListener
    spark.listenerManager.register(l)
    l
  }
}

/** Scheduler-stage timing collector — the per-stage analogue of the
  * reference's `stage_metrics` table (`pipeline_store.py:565-572`). Where
  * the reference times each generator stage, Spark's unit of attributable
  * wall time is the scheduler stage; each completed stage records wall
  * time, summed executor task time, and task count.
  */
final class StageListener(jobGroup: Option[String],
                          onStage: () => Unit = () => (),
                          sc: Option[org.apache.spark.SparkContext] = None)
    extends org.apache.spark.scheduler.SparkListener {
  final case class StageRec(stageId: Int, name: String, wallNs: Long,
                            executorRunNs: Long, nTasks: Int,
                            peakMemoryBytes: Long)

  private val buf = mutable.ArrayBuffer.empty[StageRec]
  // completion events carry no scheduler properties, so job-group membership
  // is resolved at SUBMISSION time (SparkListenerStageSubmitted.properties)
  // and remembered by stage id until completion
  private val accepted = mutable.Set.empty[Int]

  override def onStageSubmitted(
      ss: org.apache.spark.scheduler.SparkListenerStageSubmitted): Unit =
    jobGroup.foreach { g =>
      val sg = Option(ss.properties)
        .flatMap(p => Option(p.getProperty("spark.jobGroup.id")))
      if (sg.contains(g)) buf.synchronized { accepted += ss.stageInfo.stageId; () }
    }

  override def onStageCompleted(
      sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
    val si = sc.stageInfo
    val mine = buf.synchronized {
      jobGroup.isEmpty || accepted.remove(si.stageId)
    }
    if (!mine) return // a concurrent job in the same session — not this run's
    val wallNs = (for { s <- si.submissionTime; c <- si.completionTime }
      yield (c - s) * 1000000L).getOrElse(0L)
    buf.synchronized {
      buf += StageRec(si.stageId, si.name, wallNs,
        si.taskMetrics.executorRunTime * 1000000L, si.numTasks,
        // summed-across-tasks peak execution memory — the reference's
        // index_results.peak_memory_bytes (core/pipeline_store.py:550-563)
        si.taskMetrics.peakExecutionMemory)
    }
    // progress hook (the Runner's throttled mid-index heartbeat refresh);
    // never let a callback failure poison the shared listener bus
    try onStage() catch { case _: Throwable => () }
  }

  def records: Seq[StageRec] = buf.synchronized(buf.toVector)

  /** Listener events are delivered asynchronously; drain the bus before
    * reading. The caller's action has already returned, so every stage
    * event is posted — `waitUntilEmpty` makes delivery deterministic in a
    * handful of ms, where the poll-until-stable loop this replaces paid
    * ≥ 2 polls × stableMs PER INDEX and the full 2 s timeout whenever a
    * job group legitimately produced no stage events (measured: the
    * dominant non-job wall inside q_ledger_reset / the pipeline queries).
    * The poll fallback remains only for a listener constructed without a
    * context (spec-level direct use).
    */
  def awaitQuiesce(timeoutMs: Long = 2000L, stableMs: Long = 100L): Seq[StageRec] = {
    sc match {
      case Some(c) =>
        // waitUntilEmpty throws TimeoutException if the bus doesn't drain
        // within its internal default; degrade to the records delivered so
        // far (the old poll path's behavior) instead of failing the run
        try org.apache.spark.sql.graft.Bridge.drainListenerBus(c)
        catch { case _: java.util.concurrent.TimeoutException => () }
        records
      case None =>
        val deadline = System.currentTimeMillis() + timeoutMs
        var last = -1
        while (System.currentTimeMillis() < deadline) {
          val n = buf.synchronized(buf.length)
          if (n == last && n > 0) return records
          last = n
          Thread.sleep(stableMs)
        }
        records
    }
  }
}

object StageListener {
  /** Attach to the SparkContext; detach with `detach` when done. When
    * `jobGroup` is given, only stages submitted under that
    * `sc.setJobGroup` id are recorded — the listener sits on the SHARED
    * SparkContext, so without the filter a concurrent job on another
    * thread would leak its stages into this run's stage_metrics.
    */
  def attach(spark: SparkSession, jobGroup: Option[String] = None,
             onStage: () => Unit = () => ()): StageListener = {
    val l = new StageListener(jobGroup, onStage, Some(spark.sparkContext))
    spark.sparkContext.addSparkListener(l)
    l
  }
  def detach(spark: SparkSession, l: StageListener): Unit =
    spark.sparkContext.removeSparkListener(l)
}
