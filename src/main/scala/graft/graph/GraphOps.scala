package graft.graph

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Atomic-graph (atm domain) operators: per-system array columns, metadata
  * inventory, and the offset-preallocated parallel write pattern
  * (`domains/atm/sinks/zarr_writer.py:209,467`): every system's atoms land at
  * `[offset, offset + natoms)` in a global array, so workers write disjoint
  * regions concurrently.
  */
object GraphOps {

  /** Distributed EXCLUSIVE prefix sum over `valueCol` in `orderCol` order —
    * the global atom-offset table. A bare `Window.orderBy` would collapse
    * everything into ONE task; this is the scalable two-pass form:
    * range-partition by the order key, partition-local cumulative sums, then
    * add broadcast per-partition base offsets. O(rows/partitions) per task,
    * one tiny driver collect of partition totals.
    */
  def exclusivePrefixSum(df: DataFrame, orderCol: String, valueCol: String,
                         outCol: String = "offset",
                         numPartitions: Int = 0): DataFrame = {
    val spark = df.sparkSession
    val n = if (numPartitions > 0) numPartitions
            else spark.sessionState.conf.numShufflePartitions
    val ranged = df.repartitionByRange(n, col(orderCol))
      .sortWithinPartitions(orderCol)
      .withColumn("_pid", spark_partition_id())
    // partition-local INCLUSIVE cumsum (cheap: partition-bounded window)
    val w = Window.partitionBy(col("_pid")).orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = ranged.withColumn("_cum", sum(col(valueCol)).over(w))
    // tiny driver-side pass: one row per partition
    val totals = local.groupBy(col("_pid")).agg(sum(col(valueCol)).as("_tot"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
    val bases = totals.scanLeft(0L)(_ + _._2).zip(totals.map(_._1))
      .map { case (base, pid) => (pid, base) }
    import spark.implicits._
    val baseDf = bases.toSeq.toDF("_pid", "_base")
    local.join(broadcast(baseDf), "_pid")
      .withColumn(outCol, col("_base") + col("_cum") - col(valueCol))
      .drop("_pid", "_cum", "_base")
  }

  /** AtomicInfoFilter (`domains/atm/filters/atomic_info.py:44-76`): per-system
    * structural metadata — atom/edge counts, composition, PBC — as one narrow
    * projection (the reference logs it per item; here it IS a table).
    */
  def atomicInfo(systems: DataFrame): DataFrame =
    systems.select(col("sys_id"),
      size(col("atomic_numbers")).as("n_atoms"),
      (size(col("edge_index_src"))).as("n_edges"),
      array_distinct(col("atomic_numbers")).as("species"),
      size(array_distinct(col("atomic_numbers"))).as("n_species"),
      col("pbc"), col("energy"))

  /** Per-field stats over system-level array columns in long form: explode
    * (sys_id, field array) → grouped moments (AtomicStatsFilter,
    * `domains/atm/filters/stats.py:273`, same agg family as mesh stats).
    */
  def perAtomFieldStats(systems: DataFrame, arrayCol: String): DataFrame =
    systems.select(col("sys_id"), explode(col(arrayCol)).as("value"))
      .agg(count(lit(1)).as("n"), avg(col("value")).as("mean"),
        var_pop(col("value")).as("var_pop"),
        min(col("value")).as("min"), max(col("value")).as("max"))

  /** Offset-preallocated write plan: (sys_id, natoms, offset) — the disjoint
    * region map the parallel writer consumes.
    */
  def writePlan(systems: DataFrame): DataFrame =
    exclusivePrefixSum(
      systems.select(col("sys_id"), size(col("atomic_numbers")).cast("long").as("natoms")),
      "sys_id", "natoms")
}
