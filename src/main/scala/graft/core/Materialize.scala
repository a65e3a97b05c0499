package graft.core

import org.apache.spark.sql.DataFrame

/** Eager materialization with lineage truncation — the shared discipline for
  * results whose lineage must never replay (sampled `repartitionByRange`
  * boundaries, per-call caches released before return).
  *
  * Two tiers, picked by session state:
  *
  *  - a checkpoint dir is configured (`sc.setCheckpointDir`) → RELIABLE
  *    `checkpoint(eager = true)`: blocks live on HDFS/S3, so an executor
  *    loss or dynamic-allocation decommission replays from storage — the
  *    100 TB fault-tolerance mode. Files persist until the application
  *    cleans its checkpoint dir (Spark never deletes reliable checkpoints
  *    itself); that persistence is the point for results that outlive the
  *    producing call.
  *  - no checkpoint dir → eager `localCheckpoint(true)`: blocks live in
  *    executor storage (MEMORY_AND_DISK). TRADEOFF, stated plainly: the
  *    truncated lineage means a lost executor makes the result
  *    unrecoverable (checkpoint block not found) instead of silently
  *    recomputable — for the prefix-sum family that is the CORRECT
  *    failure mode, because a recompute through `repartitionByRange`
  *    re-SAMPLES partition boundaries and can silently mis-assign rows
  *    against already-collected per-partition bases (wrong results beat
  *    loud failure never). Blocks are released by the ContextCleaner once
  *    the result is unreachable.
  */
object Materialize {
  def pin(df: DataFrame): DataFrame =
    if (df.sparkSession.sparkContext.getCheckpointDir.isDefined)
      df.checkpoint(eager = true)
    else df.localCheckpoint(eager = true)
}
