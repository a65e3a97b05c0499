package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
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
    val idxKeys = indexKeys(index, idCol, textCol, k)
    arrivalKeys(incoming, idCol, textCol, k)
      .join(idxKeys, Seq("tier", "key"))
      .select(col("id"), col("old_id"), col("tier"))
  }

  /** Standing-index key rows: (old_id, key, tier) — exact = normalized-md5
    * fingerprint, near = each MinHash band key (the batch aggregation
    * shape; the index side is batch by contract).
    */
  private def indexKeys(index: DataFrame, idCol: String, textCol: String,
                        k: Int): DataFrame = {
    val idxFp = index.select(col(idCol).cast("long").as("old_id"),
      graft.functions.Text.fingerprint(col(textCol)).as("key"),
      lit("exact").as("tier"))
    val idxBands = DedupOps.bandKeys(
      DedupOps.minhashSignatures(
        DedupOps.shingleSet(index, idCol, textCol, k), idCol), idCol)
      .select(col(idCol).cast("long").as("old_id"),
        concat_ws("|", col("band"), col("band_key")).as("key"),
        lit("near").as("tier"))
    idxFp.unionByName(idxBands)
  }

  /** Arrival key rows: (id, key, tier) — same key space as [[indexKeys]],
    * but signatures via the single-pass typed map per row (the streaming
    * shape — no aggregation; see [[nearDupCandidates]]).
    */
  private def arrivalKeys(incoming: DataFrame, idCol: String,
                          textCol: String, k: Int): DataFrame = {
    val spark = incoming.sparkSession
    import spark.implicits._
    val nBands = DedupOps.NumPerms / DedupOps.BandRows
    val fpRows = incoming.select(col(idCol).cast("long").as("id"),
      graft.functions.Text.fingerprint(col(textCol)).as("key"),
      lit("exact").as("tier"))
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
  }

  // ------------------------- folding ingestion (standing-index refresh)

  /** Folding snapshot-ingest dedup: like [[incrementalCandidates]] but the
    * standing index is a PARQUET DIRECTORY that each micro-batch appends
    * its NOVEL arrivals' keys back into, so batch N+1 dedups against
    * batch N (the production ingestion loop; the static-index variant
    * classifies but never learns). Per batch, inside `foreachBatch`:
    *
    *  1. match arrivals against the index snapshot (exact + near tiers,
    *     stateless equi-joins — identical semantics to the static path)
    *     plus WITHIN-batch exact matches (fingerprint groups keep the
    *     min-id winner; losers match it). Within-batch near candidates
    *     are [[nearDupCandidates]]'s job, not this path's (documented).
    *  2. install the match rows, then the novel arrivals' keys (novel =
    *     no exact match anywhere; near candidates do NOT block folding —
    *     they are candidates pending the batch verify tier), each via
    *     stage-then-rename under a `b<batchId>_` file prefix — the ledger
    *     commit discipline.
    *
    * EXACTLY-ONCE across restarts: `foreachBatch` replays a batch id
    * after a crash; each apply first REMOVES its own `b<batchId>_` files
    * from both directories, so a half-applied batch is wiped and
    * re-installed rather than doubled. Readers between the wipe and the
    * re-install see the pre-batch state — the same transient the ledger's
    * compact() documents. State is O(index keys) on disk, O(batch) in
    * memory; nothing driver-side scales with the corpus.
    */
  def foldingIncrementalDedup(incoming: DataFrame, idCol: String,
                              textCol: String, k: Int, indexDir: String,
                              matchesDir: String, checkpointDir: String)
      : org.apache.spark.sql.streaming.StreamingQuery =
    incoming.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        applyIncrementalBatch(batch, batchId, idCol, textCol, k,
          indexDir, matchesDir)
      }
      .start()

  /** Seed the standing index directory with EVERY key of `index` (the
    * initial corpus — no dedup applied; installed under the `seed_`
    * prefix so batch replay hygiene never touches it).
    */
  def seedIndex(index: DataFrame, idCol: String, textCol: String, k: Int,
                indexDir: String): Unit =
    install(indexKeys(index, idCol, textCol, k), indexDir, "seed_")

  /** One batch of the folding loop — public so a batch backfill can run
    * the identical transition without a streaming query. Idempotent per
    * (batch, batchId): replays wipe their own installs first.
    */
  def applyIncrementalBatch(batch: DataFrame, batchId: Long, idCol: String,
                            textCol: String, k: Int, indexDir: String,
                            matchesDir: String): Unit = {
    val spark = batch.sparkSession
    Seq(indexDir, matchesDir).foreach(removeBatchFiles(spark, _, batchId))
    val index = readIndexDir(spark, indexDir)
    val keys = arrivalKeys(batch, idCol, textCol, k)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val idxMatches = keys.join(index, Seq("tier", "key"))
        .select(col("id"), col("old_id"), col("tier"))
      val fp = keys.filter(col("tier") === "exact").select("id", "key")
      val withinMatches = fp
        .join(fp.groupBy("key").agg(min("id").as("old_id")), "key")
        .filter(col("id") > col("old_id"))
        .select(col("id"), col("old_id"), lit("exact").as("tier"))
      val matches = idxMatches.unionByName(withinMatches)
      install(matches, matchesDir, s"b${batchId}_")
      val dupIds = matches.filter(col("tier") === "exact")
        .select("id").distinct()
      val novelKeys = keys.join(dupIds, Seq("id"), "left_anti")
        .select(col("id").as("old_id"), col("key"), col("tier"))
      install(novelKeys, indexDir, s"b${batchId}_")
    } finally { keys.unpersist(); () }
  }

  /** Index-directory snapshot — schema-typed empty frame on cold start
    * (an empty standing index classifies every arrival novel).
    */
  private def readIndexDir(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val hasData = fs.exists(p) && fs.listStatus(p).exists { s =>
      s.isFile && s.getPath.getName.endsWith(".parquet")
    }
    if (!hasData) Seq.empty[(Long, String, String)]
      .toDF("old_id", "key", "tier")
    else spark.read.parquet(dir)
  }

  /** Stage-then-rename install (the ledger commit discipline): write to a
    * `_staging` subdir (hidden from readers — Spark skips `_`-prefixed
    * paths), rename the part files in under `<prefix><uuid>.parquet`.
    */
  private def install(df: DataFrame, dir: String, prefix: String): Unit = {
    val spark = df.sparkSession
    val conf = spark.sparkContext.hadoopConfiguration
    val target = new org.apache.hadoop.fs.Path(dir)
    val fs = target.getFileSystem(conf)
    fs.mkdirs(target)
    val tmp = new org.apache.hadoop.fs.Path(
      s"$dir/_staging/${java.util.UUID.randomUUID()}")
    df.write.mode("overwrite").parquet(tmp.toString)
    fs.listStatus(tmp).iterator
      .filter(_.getPath.getName.endsWith(".parquet"))
      .foreach { f =>
        require(fs.rename(f.getPath, new org.apache.hadoop.fs.Path(target,
          s"$prefix${java.util.UUID.randomUUID()}.parquet")),
          s"folding install into $dir failed")
      }
    fs.delete(tmp, true)
  }

  private def removeBatchFiles(spark: SparkSession, dir: String,
                               batchId: Long): Unit = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p))
      fs.listStatus(p).iterator
        .filter(s => s.isFile && s.getPath.getName.startsWith(s"b${batchId}_"))
        .foreach(s => fs.delete(s.getPath, false))
  }
}
