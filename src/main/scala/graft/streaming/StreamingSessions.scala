package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming event-time sessionization — the continuous-ingestion face of
  * the batch `RelationalOps.sessionize` gap rule, expressed Spark-first
  * through the native `session_window` aggregation (SURVEY §2.7): windows
  * extend `[first_ts, last_ts + gap)` and merge on overlap, so state per
  * (entity, OPEN session) is one aggregate row, and the watermark both
  * bounds state and drives emission — a closed session flushes once the
  * watermark passes its end. Batch and streaming share the construct:
  * the same `session_window` expression aggregates a static frame, which
  * is what the oracle mirror exploits.
  *
  * Boundary semantics (spec-pinned): session windows merge when they
  * TOUCH, so an event arriving at exactly `last_ts + gap` JOINS the
  * session — the break condition is `diff > gap`, identical to the batch
  * `RelationalOps.sessionize` gap rule.
  */
object StreamingSessions {

  /** Per-(entity, session) aggregate over an event-time stream (or a
    * static frame — same expression, batch execution): session start,
    * event count, value sum. For streams, emission is APPEND mode: a
    * session row appears once its window closes below the watermark.
    */
  def sessionAgg(df: DataFrame, entityCol: String, tsCol: String,
                 valueCol: String, gap: String,
                 watermarkDelay: String): DataFrame = {
    val withWm =
      if (df.isStreaming) df.withWatermark(tsCol, watermarkDelay) else df
    withWm
      .groupBy(session_window(col(tsCol), gap).as("session"), col(entityCol))
      .agg(count(lit(1)).as("n_events"), sum(col(valueCol)).as("sum_value"))
      .select(col(entityCol), col("session.start").as("session_start"),
        col("n_events"), col("sum_value"))
  }
}
