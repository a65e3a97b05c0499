package graft

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Exactly-once restart parity — the reference's per-index exactly-once
  * contract (`core/base.py:595-602`) applied to the streaming face:
  * every stateful operator family is killed between triggers, its data
  * keeps arriving while it is down, and the resumed query must drain to
  * the SAME result as an uninterrupted batch run. State (fingerprints,
  * open sessions, join buffers, sketch registers, Welford moments) must
  * come back from the checkpoint, and the foreachBatch sink dedups by
  * batchId, so a replayed trigger is absorbed idempotently — the
  * end-to-end exactly-once shape of a production pipeline.
  */
class StreamingRestartSpec extends SparkSpec {

  /** foreachBatch sink that records rows per batchId (replay-idempotent:
    * a re-delivered batchId overwrites its own previous rows).
    */
  private final class BatchLog {
    val batches = TrieMap.empty[Long, Seq[Row]]
    def sink(df: DataFrame, id: Long): Unit = batches.put(id, df.collect().toSeq)
    def allRows: Seq[Row] = batches.toSeq.sortBy(_._1).flatMap(_._2)
    /** For update-mode operators: the newest row per key wins. */
    def latestBy(key: Row => Any): Map[Any, Row] =
      batches.toSeq.sortBy(_._1).flatMap(_._2.map(r => key(r) -> r)).toMap
    /** For complete-mode operators: the final batch is the result. */
    def lastBatch: Seq[Row] = batches.maxBy(_._1)._2
  }

  private def ckpt(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"restart_$tag").toString

  /** start → feed1 → drain → KILL → feed2 (arrives while down) →
    * restart from the same checkpoint → drain.
    */
  private def runKillResume(start: () => StreamingQuery,
                            feed1: () => Unit, feed2: () => Unit): Unit = {
    val q1 = start()
    try { feed1(); q1.processAllAvailable() } finally q1.stop()
    feed2()
    val q2 = start()
    try { q2.processAllAvailable() } finally q2.stop()
  }

  test("stats: welfordPerKey state survives a kill/resume; drained " +
    "moments equal the batch Welford over all arrivals") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val input = MemoryStream[(String, Double)]
    val log = new BatchLog
    val cp = ckpt("welford")
    runKillResume(
      () => graft.streaming.StreamingStats.welfordPerKey(input.toDS())
        .toDF("key", "state")
        .writeStream.outputMode("update")
        .option("checkpointLocation", cp)
        .foreachBatch(log.sink _).start(),
      () => { input.addData(("a", 2.0), ("a", 4.0), ("b", 10.0)); () },
      () => { input.addData(("a", 6.0)); () })
    val last = log.latestBy(_.getString(0)).map { case (k, r) =>
      val st = r.getStruct(1)
      k -> ((st.getLong(0), st.getDouble(1), st.getDouble(2)))
    }
    // a: [2,4,6] -> n=3 mean=4 M2=8 ONLY if the (n=2, mean=3) state was
    // restored from the checkpoint before folding in the post-kill 6.0
    assert(last("a") == ((3L, 4.0, 8.0)), last.toString)
    assert(last("b") == ((1L, 10.0, 0.0)), last.toString)
  }

  test("dedup: a fingerprint seen before the kill still suppresses its " +
    "duplicate after the resume") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val base = 1700000000L
    val input = MemoryStream[(Long, String, Long)]
    def shaped = input.toDF().toDF("id", "fp", "epoch")
      .withColumn("ts", timestamp_seconds(col("epoch"))).drop("epoch")
    val log = new BatchLog
    val cp = ckpt("dedup")
    runKillResume(
      () => graft.streaming.StreamingStats
        .dedupByFingerprint(shaped, "ts", "fp", "10 minutes")
        .writeStream.outputMode("append")
        .option("checkpointLocation", cp)
        .foreachBatch(log.sink _).start(),
      () => { input.addData((1L, "x", base + 1)); () },
      // the duplicate of x arrives AFTER the kill, within the watermark
      () => { input.addData((2L, "x", base + 5), (3L, "y", base + 6)); () })
    val ids = log.allRows.map(_.getLong(0)).toSet
    assert(ids == Set(1L, 3L),
      s"expected first-arrival of x and the novel y only, got $ids")
  }

  test("sessions: an open session window spans the kill; the drained row " +
    "counts events from both sides of the restart") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val base = 1700000000L
    val input = MemoryStream[(String, Long, Double)]
    def shaped = input.toDF().toDF("entity", "epoch", "value")
      .withColumn("ts", timestamp_seconds(col("epoch"))).drop("epoch")
    val log = new BatchLog
    val cp = ckpt("sessions")
    runKillResume(
      () => graft.streaming.StreamingSessions
        .sessionAgg(shaped, "entity", "ts", "value", "30 seconds", "10 seconds")
        .writeStream.outputMode("append")
        .option("checkpointLocation", cp)
        .foreachBatch(log.sink _).start(),
      () => { input.addData(("e1", base + 100, 1.0)); () },
      // the second event EXTENDS the pre-kill session (gap 30 s spans
      // 100→110); the far event advances the watermark to close it
      () => { input.addData(("e1", base + 110, 2.0),
        ("e2", base + 1000, 9.0)); () })
    val rows = log.allRows
      .map(r => (r.getString(0), r.getLong(2), r.getDouble(3)))
    assert(rows == Seq(("e1", 2L, 3.0)),
      s"expected ONE merged e1 session with both events, got $rows")
  }

  test("join: a left row buffered before the kill matches a right row " +
    "arriving after the resume") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val base = 1700000000L
    val lIn = MemoryStream[(String, Long)]
    val rIn = MemoryStream[(String, Long)]
    def shapedL = lIn.toDF().toDF("k", "epoch")
      .withColumn("lts", timestamp_seconds(col("epoch"))).drop("epoch")
    def shapedR = rIn.toDF().toDF("k", "epoch")
      .withColumn("rts", timestamp_seconds(col("epoch"))).drop("epoch")
    val log = new BatchLog
    val cp = ckpt("join")
    runKillResume(
      () => graft.streaming.StreamingJoin
        .intervalJoin(shapedL, shapedR, "k", "lts", "rts",
          "20 seconds", "10 seconds")
        .writeStream.outputMode("append")
        .option("checkpointLocation", cp)
        .foreachBatch(log.sink _).start(),
      () => { lIn.addData(("k1", base + 100)); () },
      () => {
        rIn.addData(("k1", base + 110))  // inside [100, 120] ⇒ must match
        lIn.addData(("zz", base + 1000)) // watermark advancers, no match
        rIn.addData(("zz", base + 2000))
        ()
      })
    val matches = log.allRows.map(_.getString(0))
    assert(matches == Seq("k1"),
      s"expected exactly the pre-kill left row to match, got $matches")
  }

  test("sketches: CMS registers accumulated before the kill keep counting " +
    "after the resume; drained registers equal the batch sketch") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val input = MemoryStream[String]
    val b1 = Seq.fill(5)("alpha") ++ Seq("beta", "gamma")
    val b2 = Seq.fill(3)("alpha") ++ Seq.fill(4)("delta")
    val log = new BatchLog
    val cp = ckpt("cms")
    runKillResume(
      () => graft.streaming.StreamingSketch
        .cmsRegisters(input.toDF().toDF("tok"), "tok", d = 2, w = 64L)
        .writeStream.outputMode("complete")
        .option("checkpointLocation", cp)
        .foreachBatch(log.sink _).start(),
      () => { input.addData(b1: _*); () },
      () => { input.addData(b2: _*); () })
    val got = log.lastBatch
      .map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    val want = graft.operators.StatsOps.cmsSketch(
      (b1 ++ b2).toDF("tok"), "tok", d = 2, w = 64L)
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got == want, s"drained registers != batch sketch")
  }
}
