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
