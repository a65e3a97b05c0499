package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming Count-Min sketch: the CMS is a commutative monoid (registers
  * add), so a continuous ingest can maintain it as ONE streaming
  * aggregation whose state is the d×w register table — bounded by the
  * sketch PRECISION, never by the key cardinality of the stream, which is
  * exactly why a 100 TB/day token firehose can keep a live frequency
  * sketch where an exact per-key count could not. Complete output mode:
  * the register table is tiny and fully re-emittable per trigger.
  *
  * The bucket derivation is the SAME row-salted md5 family as the batch
  * [[graft.operators.StatsOps.cmsSketch]], so a drained stream's
  * registers are bit-identical to the batch build over the same rows —
  * the stream/batch agreement q_streaming_cms gates.
  */
object StreamingSketch {

  def cmsRegisters(stream: DataFrame, keyCol: String, d: Int = 3,
                   w: Long = 1024L): DataFrame = {
    require(d >= 1 && d <= 16, s"depth d=$d outside 1..16")
    require(w >= 2, s"width w=$w must be >= 2")
    stream
      .select(explode(sequence(lit(0), lit(d - 1))).as("j"),
        col(keyCol).as("_k"))
      .select(col("j"),
        (graft.functions.Text.hash64(
          concat(col("j").cast("string"), lit("_"), col("_k"))) % w)
          .as("bucket"))
      .groupBy("j", "bucket")
      .agg(count(lit(1)).as("cnt"))
  }

  /** Streaming KMV distinct sketch: the k-smallest-distinct-hash state is
    * a SEMILATTICE (merge is associative, commutative, idempotent), so a
    * continuous ingest maintains it as one streaming aggregation whose
    * state is k longs per set — bounded by sketch precision, never by
    * stream cardinality, and trigger boundaries cannot change the result
    * (idempotence absorbs replays). Same bounded Aggregator and 60-bit
    * md5 hash as the batch [[graft.operators.StatsOps.kmvSketch]], so a
    * drained stream's sketch is bit-identical to the batch build — the
    * stream/batch agreement q_streaming_kmv gates.
    */
  def kmvSketch(stream: DataFrame, setCol: String, valueCol: String,
                k: Int): DataFrame = {
    val spark = stream.sparkSession
    import spark.implicits._
    val agg = new graft.functions.KmvAgg(k)
    stream.select(col(setCol).cast("string"),
        graft.functions.Text.hash64(col(valueCol).cast("string")).as("_h"))
      .as[(String, Long)]
      .groupByKey(_._1)
      .mapValues(_._2)
      .agg(agg.toColumn)
      .toDF(setCol, "sketch")
  }
}
