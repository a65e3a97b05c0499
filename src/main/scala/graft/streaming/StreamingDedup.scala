package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.operators.DedupOps

/** Streaming MinHash-LSH near-duplicate CANDIDATE detection — the
  * continuous-ingestion face of the batch `minhashSignatures → bandPairs`
  * path (SURVEY §2.7 composes the reference's batch-only dedup semantics
  * with Structured Streaming the same way `StreamingStats` does for the
  * stats filters).
  *
  * Shape: signatures are a single-pass typed map per row
  * (`DedupOps.minhashSigRow` — no shuffle, no aggregation; see its note on
  * why nested HOF columns are the WRONG shape here), banded per row, and
  * the only stateful
  * operator is one `flatMapGroupsWithState` keyed by (band, bucket): state
  * holds the ids seen in that bucket inside the watermark horizon, each
  * arrival emits candidate pairs against them, and event-time timeouts
  * evict buckets whose newest member has aged past the delay — state is
  * O(rate × delay), never O(corpus). Emitted pairs are per colliding band;
  * downstream verification (exact Jaccard / cosine on the candidate set)
  * is the same batch discipline as `bandPairs → jaccardPairs`.
  *
  * On a BATCH frame the same banding runs through the `bandPairs`-style
  * collision join instead of state (the Dataset contract: one semantics,
  * two execution shapes).
  */
object StreamingDedup {

  /** (ia, ib, band) candidate rows; `ia < ib`, one row per colliding band.
    * `df` must carry `idCol` castable to long, `textCol`, and an event-time
    * `tsCol` (timestamp) when streaming.
    */
  def nearDupCandidates(df: DataFrame, idCol: String, textCol: String,
                        tsCol: String, k: Int,
                        watermarkDelayMs: Long): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val nBands = DedupOps.NumPerms / DedupOps.BandRows
    val buckets = array((0 until nBands).map { b =>
      struct(lit(b).as("band"),
        concat_ws("_", (0 until DedupOps.BandRows).map(r =>
          element_at(col("_sig"), b * DedupOps.BandRows + r + 1)): _*).as("bucket"))
    }: _*)
    val sigs = df
      .select(col(idCol).cast("long").as("id"), col(tsCol).as("ts"),
        col(textCol).as("text"))
      .as[(Long, java.sql.Timestamp, String)]
      .map { case (id, ts, text) => (id, ts, DedupOps.minhashSigRow(text, k)) }
      .toDF("id", "ts", "_sig")
    // the watermark goes AFTER the typed map: the event-time marker does
    // not propagate through an object-serialization boundary
    val base = if (df.isStreaming)
      sigs.withWatermark("ts", s"$watermarkDelayMs milliseconds") else sigs
    val banded = base
      .filter(size(col("_sig")) > 0)
      .select(col("id"), col("ts"), explode(buckets).as("bb"))
      .select(col("id"), col("ts"),
        col("bb.band").as("band"), col("bb.bucket").as("bucket"))
    if (!df.isStreaming) {
      val l = banded.select(col("band"), col("bucket"), col("id").as("ia"))
      val r = banded.select(col("band"), col("bucket"), col("id").as("ib"))
      l.join(r, Seq("band", "bucket")).filter(col("ia") < col("ib"))
        .select("ia", "ib", "band")
    } else {
      banded.as[(Long, java.sql.Timestamp, Int, String)]
        .groupByKey(x => (x._3, x._4))
        .flatMapGroupsWithState(OutputMode.Append,
          GroupStateTimeout.EventTimeTimeout)(emitPairs(watermarkDelayMs) _)
        .toDF("ia", "ib", "band")
    }
  }

  /** Per-bucket state transition: pair each arrival against the bucket's
    * watermark-live members, then extend the eviction deadline to the
    * newest event time + delay.
    */
  private def emitPairs(delayMs: Long)(
      key: (Int, String),
      rows: Iterator[(Long, java.sql.Timestamp, Int, String)],
      state: GroupState[List[Long]]): Iterator[(Long, Long, Int)] = {
    if (state.hasTimedOut) {
      state.remove()
      Iterator.empty
    } else {
      var seen = state.getOption.getOrElse(Nil)
      val out = scala.collection.mutable.ListBuffer.empty[(Long, Long, Int)]
      var maxTs = Long.MinValue
      rows.foreach { case (id, ts, band, _) =>
        maxTs = math.max(maxTs, ts.getTime)
        seen.foreach { s =>
          if (s != id) out += ((math.min(s, id), math.max(s, id), band))
        }
        if (!seen.contains(id)) seen = id :: seen
      }
      state.update(seen)
      if (maxTs != Long.MinValue) state.setTimeoutTimestamp(maxTs + delayMs)
      out.iterator
    }
  }

  /** Streaming snapshot-ingest dedup — the continuous face of
    * [[graft.operators.DedupOps.incrementalDedup]]'s first two tiers: an
    * INCOMING stream is classified against a STANDING batch index with
    * nothing but STATELESS stream-static equi-joins, so the query runs in
    * append mode with no watermark and no state store at all — the index
    * side (fingerprints + LSH band keys) is computed once per (micro)batch
    * plan from the static frame, and per-arrival cost follows the batch,
    * never the corpus. Emits one row per (incoming id, index id, tier)
    * match: tier `exact` = normalized-md5 fingerprint equality, tier
    * `near` = a colliding MinHash band (candidate grade — the Jaccard
    * VERIFY tier stays the batch discipline downstream of the drain,
    * exactly like `bandPairs → jaccardPairs`). Works unchanged on a batch
    * `incoming` frame (one semantics, two execution shapes).
    */
  def incrementalCandidates(incoming: DataFrame, index: DataFrame,
                            idCol: String, textCol: String,
                            k: Int): DataFrame = {
    val spark = incoming.sparkSession
    import spark.implicits._
    val idxFp = index.select(col(idCol).cast("long").as("old_id"),
      graft.functions.Text.fingerprint(col(textCol)).as("key"),
      lit("exact").as("tier"))
    val idxBands = DedupOps.bandKeys(
      DedupOps.minhashSignatures(
        DedupOps.shingleSet(index, idCol, textCol, k), idCol), idCol)
      .select(col(idCol).cast("long").as("old_id"),
        concat_ws("|", col("band"), col("band_key")).as("key"),
        lit("near").as("tier"))
    val idxKeys = idxFp.unionByName(idxBands)
    val nBands = DedupOps.NumPerms / DedupOps.BandRows
    val fpRows = incoming.select(col(idCol).cast("long").as("id"),
      graft.functions.Text.fingerprint(col(textCol)).as("key"),
      lit("exact").as("tier"))
    // signatures as a single-pass typed map per row (the streaming shape —
    // no aggregation; see nearDupCandidates)
    val sigRows = incoming
      .select(col(idCol).cast("long").as("id"), col(textCol).as("text"))
      .as[(Long, String)]
      .map { case (id, text) => (id, DedupOps.minhashSigRow(text, k)) }
      .toDF("id", "_sig")
      .filter(size(col("_sig")) > 0)
      .select(col("id"), explode(array((0 until nBands).map { b =>
        concat_ws("|", lit(b),
          concat_ws("_", (0 until DedupOps.BandRows).map(r =>
            element_at(col("_sig"), b * DedupOps.BandRows + r + 1)): _*))
      }: _*)).as("key"), lit("near").as("tier"))
    fpRows.unionByName(sigRows)
      .join(idxKeys, Seq("tier", "key"))
      .select(col("id"), col("old_id"), col("tier"))
  }
}
