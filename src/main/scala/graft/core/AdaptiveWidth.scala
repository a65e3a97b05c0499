package graft.core

import org.apache.spark.sql.SparkSession

/** Scale-adaptive shuffle width for ITERATIVE loops (connected components,
  * pagerank-style propagation): each round re-pays the session's full
  * shuffle width in scheduling and exchange constants, and AQE's runtime
  * coalescing does not remove the per-round fixed cost of planning and
  * launching a session-width stage over a loop state that may be tiny.
  * Guide §2's rule applied to loops: derive the width from the loop
  * state's size, floored at min(4, session parallelism) and capped by the
  * session's configured `spark.sql.shuffle.partitions` — at production
  * scale the cap governs (loop runs at cluster width, unchanged); on a
  * small problem the floor governs. Rows-per-partition is a conf
  * (`spark.graft.loop.rowsPerPartition`, default 2M label-sized rows) so
  * deployments retune without a code change.
  */
object AdaptiveWidth {
  val RowsPerPartitionKey = "spark.graft.loop.rowsPerPartition"

  def forRows(s: SparkSession, rows: Long): Int = {
    val perPart = s.conf.getOption(RowsPerPartitionKey)
      .map(_.toLong).getOrElse(2000000L)
    val cur = math.max(1, s.conf.get("spark.sql.shuffle.partitions").toInt)
    val bySize = math.ceil(rows.toDouble / perPart.toDouble).toInt
    math.min(cur, math.max(math.min(4, cur), bySize))
  }

  /** Run `f` with `spark.sql.shuffle.partitions` scaled to the loop
    * state's row count, restoring the session value after.
    *
    * NOT thread-safe across loops: mutates the session-scoped conf
    * (set/restore) — concurrent scopes on one SparkSession can clobber or
    * leak each other's width. All in-repo callers run single-threaded on
    * the session (see StatePartitions.scaled for the same contract);
    * concurrent callers need per-thread `SparkSession.newSession`.
    */
  def scaled[A](s: SparkSession, rows: Long)(f: => A): A = {
    val key = "spark.sql.shuffle.partitions"
    val old = s.conf.get(key)
    s.conf.set(key, forRows(s, rows).toString)
    try f finally s.conf.set(key, old)
  }
}
