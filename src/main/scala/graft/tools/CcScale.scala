package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Connected-components decade measurement (VERDICT r10 item 3): the CC
  * machinery is the heaviest stage of the dedup/leakage family, and it is
  * the one place where ScaleUp's clone replication CANNOT provide the
  * scale step — cloning every document 1000× multiplies each LSH bucket by
  * 1000 and the candidate PAIR set by up to 10⁶ (quadratic in clone count,
  * the established exclusion in BASELINE.md), which measures the clone
  * artifact, not the algorithm. So this tool scales the two axes the
  * algorithms actually bill against, independently and honestly:
  *
  *  - component COUNT (data-parallel width): N chain components of fixed
  *    depth, N over three decades;
  *  - component DEPTH (round count): fixed node budget re-shaped from
  *    shallow dup-groups to deep chains — the regime where min-label's
  *    O(diameter) rounds lose to large-star/small-star's O(log²).
  *
  * Chains are the worst case for min-label (diameter = depth); dup
  * clusters in the wild are the easy case (star-ish, diameter ≤ 2).
  * Both algorithms run on identical edge sets; output parity is asserted
  * per cell (count + label-sum equality), so the timing table can't
  * silently compare different answers.
  *
  * Usage: `runMain graft.tools.CcScale [maxNodesLog10]`
  * Prints one markdown row per (shape, algorithm): wall seconds + rounds.
  */
object CcScale {

  /** N chain components of `depth` nodes each: node ids interleave across
    * components (id = pos·N + comp) so chain edges NEVER sit in the same
    * partition run — the adversarial layout for label propagation.
    */
  private def chainEdges(spark: SparkSession, n: Long, depth: Int): DataFrame =
    // `div`, not `/`: Spark's `/` on longs is DOUBLE division, which would
    // mint fractional node ids and silently hand each algorithm a
    // different graph (stars casts to long, min-label doesn't)
    spark.range(n * (depth - 1)).select(
      (col("id") % n).as("comp"), expr(s"id div $n").as("pos"))
      .select((col("pos") * n + col("comp")).as("da"),
        ((col("pos") + 1) * n + col("comp")).as("db"))

  private def ids(spark: SparkSession, n: Long, depth: Int): DataFrame =
    spark.range(n * depth).select(col("id").as("doc_id"))

  private def time[A](f: => A): (A, Double) = {
    val t0 = System.nanoTime()
    val r = f
    (r, (System.nanoTime() - t0) / 1e9)
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .appName("graft-cc-scale").master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // (label, N components, depth): width decades at dup-group depth 8,
    // then depth decades at a fixed 2.56 M-node budget
    val shapes = Seq(
      ("width 32k×8", 32000L, 8),
      ("width 320k×8", 320000L, 8),
      ("width 3.2M×8", 3200000L, 8),
      ("depth 40k×64", 40000L, 64),
      ("depth 5k×512", 5000L, 512),
      ("depth 625×4096", 625L, 4096))

    println("| shape (N comps × depth) | nodes | minlabel s | rounds | stars s | rounds |")
    println("|---|---|---|---|---|---|")
    shapes.foreach { case (label, n, depth) =>
      val e = chainEdges(spark, n, depth).persist()
      val v = ids(spark, n, depth).persist()
      e.count(); v.count()

      // min-label needs maxIter > diameter; cap the deepest shapes where
      // O(diameter) rounds are the measured point of failure-by-cost
      val runMinLabel = depth <= 512
      val (mlTime, mlRounds, mlSum) =
        if (runMinLabel) {
          val ((df, rounds), t) = time {
            val (df, r) = graft.operators.DedupOps.connectedComponentsRounds(
              v, "doc_id", e, maxIter = depth + 2)
            val row = df.agg(count(lit(1)), sum(col("component"))).first()
            ((row.getLong(0), row.getLong(1)), r)
          }
          (t, rounds, df)
        } else (-1.0, -1, (0L, 0L))

      val ((stSum, stRounds), stTime) = time {
        val (df, r) = graft.operators.DedupOps.connectedComponentsStarsRounds(
          v, "doc_id", e, maxIter = 40)
        val row = df.agg(count(lit(1)), sum(col("component"))).first()
        ((row.getLong(0), row.getLong(1)), r)
      }
      // parity: same node count and identical label sum (chain component
      // minima are the pos-0 ids, so the sums are fully determined)
      if (runMinLabel) require(mlSum == stSum,
        s"$label: algorithms disagree: $mlSum vs $stSum")

      val mlCell = if (runMinLabel) f"$mlTime%.1f | $mlRounds" else "— (O(depth) rounds) | —"
      println(f"| $label | ${n * depth} | $mlCell | $stTime%.1f | $stRounds |")
      e.unpersist(); v.unpersist()
    }
    spark.stop()
  }
}
