package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

import graft.functions.WelfordState

/** Structured Streaming variants of the da-domain stats pipeline (SURVEY
  * §2.7): the reference is batch-only but its stats filters maintain *online*
  * accumulators updated one sample at a time
  * (`domains/da/filters/stats.py:541-574`) and its da sources deliver one
  * timestamp per index — the natural streaming shape. Here:
  *
  *  - `windowedGridStats` = event-time windowed grouped moments with a
  *    watermark bounding state (late data beyond the watermark is dropped —
  *    an explicit capability the reference lacks);
  *  - `welfordPerKey` = the reference's `_MomentAccumulator` as Spark-managed
  *    per-key state via `mapGroupsWithState`, using the SAME WelfordState
  *    algebra as the batch Aggregator, so batch and streaming runs agree
  *    exactly.
  */
object StreamingStats {

  /** Windowed grouped moments: works identically over a batch or streaming
    * DataFrame (same code path — the Dataset contract).
    */
  def windowedGridStats(df: DataFrame, tsCol: String, keys: Seq[String],
                        valueCol: String, windowDur: String,
                        watermarkDelay: String): DataFrame = {
    val v = col(valueCol)
    val in = if (df.isStreaming) df.withWatermark(tsCol, watermarkDelay) else df
    in.groupBy(window(col(tsCol), windowDur) +: keys.map(col): _*)
      .agg(count(v).as("n"), avg(v).as("mean"), var_pop(v).as("var_pop"),
        min(v).as("min"), max(v).as("max"))
      .select(col("window.start").as("window_start") +:
        keys.map(col) :+ col("n") :+ col("mean") :+ col("var_pop") :+
        col("min") :+ col("max"): _*)
  }

  /** Streaming exact dedup: keep the first arrival per content fingerprint,
    * watermark-bounded state (fingerprints older than the delay are evicted,
    * so state is O(rate × delay), not O(corpus)). Works identically on a
    * batch frame (dropDuplicates without state) — the Dataset contract. This
    * is the streaming face of `DedupOps.exactDupGroups` for continuous
    * ingestion pipelines.
    */
  def dedupByFingerprint(df: DataFrame, tsCol: String, fpCol: String,
                         watermarkDelay: String): DataFrame =
    if (df.isStreaming)
      df.withWatermark(tsCol, watermarkDelay)
        .dropDuplicatesWithinWatermark(fpCol)
    else df.dropDuplicates(fpCol)

  /** Per-key running Welford state, updated incrementally each trigger —
    * exactly-once streaming accumulation with the Chan-mergeable state.
    */
  def welfordPerKey(ds: Dataset[(String, Double)]): Dataset[(String, WelfordState)] = {
    val sp = ds.sparkSession
    import sp.implicits._
    ds.groupByKey(_._1)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout()) {
        (key: String, it: Iterator[(String, Double)], state: GroupState[WelfordState]) =>
          val cur = state.getOption.getOrElse(WelfordState.zero)
          val next = it.foldLeft(cur)((s, kv) => WelfordState.update(s, kv._2))
          state.update(next)
          (key, next)
      }
  }
}
