package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream-stream event-time interval join (SURVEY §2.7 depth): enrich one
  * event stream with another within a bounded time window — the classic
  * impressions⋈clicks attribution shape, and the continuous-ingestion face
  * of [[graft.operators.RelationalOps.rangeJoin]]. The reference is
  * batch-only; this is the capability its per-timestamp da sources imply
  * but cannot express.
  *
  * Both sides carry watermarks and the join condition carries the
  * event-time constraint (`right.ts` in `[left.ts, left.ts + window]`) —
  * that pair is exactly what lets Spark bound the JOIN STATE: a buffered
  * left row is droppable once the right watermark passes `left.ts +
  * window`, and vice versa, so state is O(rate × (delay + window)), never
  * O(stream). Works identically on batch frames (no watermark, plain
  * interval join) — the Dataset contract every streaming operator here
  * follows.
  */
object StreamingJoin {

  /** Inner interval join: rows of `right` matched to rows of `left` with
    * the same key and `rightTs` ∈ [`leftTs`, `leftTs` + `window`].
    * Column names must be disjoint apart from `keyCol` (the usual
    * stream-stream join hygiene); output carries the key, both
    * timestamps, and all other columns of both sides.
    */
  def intervalJoin(left: DataFrame, right: DataFrame, keyCol: String,
                   leftTs: String, rightTs: String, window: String,
                   watermarkDelay: String): DataFrame = {
    val l = (if (left.isStreaming) left.withWatermark(leftTs, watermarkDelay)
             else left).alias("l")
    val r = (if (right.isStreaming) right.withWatermark(rightTs, watermarkDelay)
             else right).alias("r")
    l.join(r,
      col(s"l.$keyCol") === col(s"r.$keyCol") &&
        col(s"r.$rightTs") >= col(s"l.$leftTs") &&
        col(s"r.$rightTs") <= col(s"l.$leftTs") + expr(s"INTERVAL $window"))
      .drop(col(s"r.$keyCol"))
  }
}
