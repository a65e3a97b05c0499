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

  /** PageRank over a directed edge list — the domain-authority quality
    * signal of web-corpus curation (crawl pipelines weight documents by
    * the link-graph standing of their host; same role the Gopher rules
    * play on the text side). Standard power iteration with damping and
    * dangling-mass redistribution, run a FIXED number of rounds so the
    * result is a pure function of (edges, iterations, damping) that an
    * oracle can replay.
    *
    * Scale design: edges are deduped, self-loop-filtered, repartitioned by
    * `src` ONCE and persisted — each round's contribution join then only
    * shuffles the (node, rank) table (two hash-bounded shuffles per round:
    * join on src, aggregate on dst). The dangling mass rides a 1-row
    * broadcast; each round's ranks are checkpointed to truncate lineage
    * (the CkptCycle lesson from connectedComponents). Node count is the
    * single driver-side scalar.
    */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
               iterations: Int, damping: Double = 0.85): DataFrame = {
    require(iterations >= 1 && iterations <= 100,
      s"iterations $iterations out of [1, 100]")
    require(damping > 0.0 && damping < 1.0, s"damping $damping out of (0, 1)")
    val e = edges
      .select(col(srcCol).cast("long").as("src"), col(dstCol).cast("long").as("dst"))
      .where(col("src") =!= col("dst"))
      .distinct()
      .repartition(col("src"))
      .persist()
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct().persist()
    val n = nodes.count()
    require(n > 0, "pageRank needs a non-empty graph")
    val deg = e.groupBy("src").agg(count(lit(1)).as("outdeg")).persist()
    var ranks = nodes.select(col("node"), lit(1.0 / n).as("rank")).localCheckpoint()
    // loop width follows the rank-table size (the CC-loop discipline,
    // guide §2): each round otherwise re-pays the session's full shuffle
    // width in per-stage constants; production-scale graphs hit the cap
    // and keep cluster width
    graft.core.AdaptiveWidth.scaled(edges.sparkSession, n) {
    (1 to iterations).foreach { _ =>
      val dangling = ranks
        .join(deg.select(col("src").as("node")), Seq("node"), "left_anti")
        .agg(coalesce(sum(col("rank")), lit(0.0)).as("m"))
      val contribs = e.join(ranks, e("src") === ranks("node"))
        .join(deg, "src")
        .select(col("dst").as("node"), (col("rank") / col("outdeg")).as("c"))
        .groupBy("node").agg(sum(col("c")).as("contrib"))
      val next = nodes.join(contribs, Seq("node"), "left")
        .crossJoin(broadcast(dangling))
        .select(col("node"),
          (lit((1.0 - damping) / n) + lit(damping) *
            (coalesce(col("contrib"), lit(0.0)) + col("m") / n)).as("rank"))
        .localCheckpoint()
      ranks.unpersist()
      ranks = next
    }
    }
    e.unpersist(); nodes.unpersist(); deg.unpersist()
    ranks
  }

  /** Unweighted single-source (or multi-source) shortest paths — BFS by
    * iterative min-distance relaxation, the remaining member of the
    * link-graph family beside PageRank / triangles / connected
    * components. Each round moves only the (node, dist) frontier table
    * (one join on src against the ONE-TIME-partitioned edges + a dst
    * min-aggregation); convergence detection rides the propagation job
    * itself via `observe` (the connectedComponents pattern), and
    * `localCheckpoint` keeps the plan depth constant. Rounds are
    * O(diameter). Returns every REACHABLE node with its hop distance.
    */
  def shortestPaths(edges: DataFrame, srcCol: String, dstCol: String,
                    sources: Seq[Long], maxIter: Int = 64): DataFrame = {
    require(sources.nonEmpty, "no source nodes")
    val spark = edges.sparkSession
    import spark.implicits._
    val e = edges
      .select(col(srcCol).cast("long").as("src"),
        col(dstCol).cast("long").as("dst"))
      .where(col("src") =!= col("dst"))
      .distinct()
      .repartition(col("src"))
      .persist()
    val m = e.count() // materialize once; also sizes the loop width below
    var dist = sources.distinct.map(s => (s, 0L)).toDF("node", "dist")
      .localCheckpoint()
    var converged = false
    var it = 0
    // loop width follows the edge count (CC-loop discipline, guide §2)
    graft.core.AdaptiveWidth.scaled(spark, m) {
    while (!converged && it < maxIter) {
      val obs = org.apache.spark.sql.Observation()
      val relaxed = dist.join(e, col("node") === col("src"))
        .select(col("dst").as("node"), (col("dist") + 1L).as("dist"))
        .union(dist)
        .groupBy("node").agg(min(col("dist")).as("dist"))
        .join(dist.withColumnRenamed("dist", "_old"), Seq("node"), "left")
        .observe(obs, sum(when(col("_old").isNull ||
          col("dist") =!= col("_old"), 1L).otherwise(0L)).as("changed"))
        .select("node", "dist")
      val next = relaxed.localCheckpoint()
      val changed = obs.get("changed").asInstanceOf[Long]
      dist = next
      converged = changed == 0
      it += 1
    }
    }
    e.unpersist()
    if (!converged) throw new IllegalStateException(
      s"shortestPaths did not converge after $maxIter rounds")
    dist
  }

  /** Per-node triangle counts over an undirected edge list — the local
    * clustering signal of link-graph analysis (spam farms are
    * triangle-dense; organic link neighborhoods are sparse). Uses the
    * classic DEGREE-ORDERED orientation (Schank–Wagner, public): every
    * undirected edge points from its lower-(degree, id) endpoint to the
    * higher, so each wedge is generated exactly once at its
    * lowest-ordered vertex and the wedge join's fan-out per vertex is
    * O(√m) instead of O(max degree) — the difference between a
    * celebrity node exploding the join and a bounded one. Triangles are
    * found as oriented wedges (a→b, a→c) closed by the oriented edge
    * b→c; each closure credits all three corners.
    */
  def triangleCounts(edges: DataFrame, srcCol: String, dstCol: String): DataFrame = {
    val und = edges
      .select(least(col(srcCol), col(dstCol)).cast("long").as("a"),
        greatest(col(srcCol), col(dstCol)).cast("long").as("b"))
      .where(col("a") =!= col("b")).distinct()
    val deg = und.select(col("a").as("n")).union(und.select(col("b").as("n")))
      .groupBy("n").agg(count(lit(1)).as("d"))
    val withDeg = und
      .join(deg.select(col("n").as("a"), col("d").as("da")), "a")
      .join(deg.select(col("n").as("b"), col("d").as("db")), "b")
    // orient toward the higher (degree, id)
    val oriented = withDeg.select(
      when(col("da") < col("db") ||
        (col("da") === col("db") && col("a") < col("b")), col("a"))
        .otherwise(col("b")).as("lo"),
      when(col("da") < col("db") ||
        (col("da") === col("db") && col("a") < col("b")), col("b"))
        .otherwise(col("a")).as("hi"))
    val w1 = oriented.select(col("lo").as("x"), col("hi").as("y"))
    val w2 = oriented.select(col("lo").as("x"), col("hi").as("z"))
    val wedges = w1.join(w2, "x").where(col("y") < col("z"))
    // close the wedge with the oriented edge between y and z (direction
    // depends on their (degree, id) order, so probe both)
    val closer = oriented.select(col("lo").as("y"), col("hi").as("z"))
      .union(oriented.select(col("hi").as("y"), col("lo").as("z")))
      .where(col("y") < col("z"))
    val tris = wedges.join(closer, Seq("y", "z"))
    tris.select(explode(array(col("x"), col("y"), col("z"))).as("node"))
      .groupBy("node").agg(count(lit(1)).as("n_triangles"))
  }

  /** Deterministic range-bucket id for the two-pass prefix sums: bucket =
    * a pure FUNCTION OF THE ROW (uniform split of the numeric key range,
    * min/max from one column-pruned pass) instead of
    * `repartitionByRange`'s SAMPLED boundaries. This is the structural fix
    * for the r11 lineage-replay bug (q_shard_plan, 99 vs 101 shards at
    * sf0.1): with sampled boundaries, any re-execution — a recomputed
    * cache block after executor loss, a second action — could re-draw
    * different partitions than the ones the collected per-partition bases
    * were computed from, silently mis-assigning offsets; pinning the
    * intermediate closed the hole but paid a full extra materialization
    * (measured +40% at the ×1000 tier). With a deterministic bucket, every
    * replay assigns every row the same bucket, so caching becomes a pure
    * OPTIMIZATION and lost blocks recompute safely. Skewed key
    * distributions degrade bucket balance, never correctness; the order
    * key must be numeric (every call site orders by a numeric id or
    * value) and unique per row (ties would make the within-bucket cumsum
    * order-dependent — same contract the sampled form had).
    */
  private def bucketId(df: DataFrame, orderCol: String, n: Int)
      : (DataFrame => DataFrame) = {
    val spark = df.sparkSession
    // Contract enforcement, piggybacked on the min/max pass (free):
    //  - NULL order keys always fail loudly — a null key has no bucket, and
    //    the join-back in the wide-input path would silently DROP its row
    //    (the sampled repartitionByRange form used to park nulls in a valid
    //    partition, hiding the ambiguity instead of surfacing it);
    //  - DUPLICATE order keys make every within-bucket cumsum (and the
    //    join-back cardinality) order-dependent. Detecting them costs one
    //    extra shuffle of the narrow key column, so the check is gated by
    //    `spark.graft.prefixsum.keyguard` — on in the test session, off in
    //    production plans whose keys are unique by construction.
    val guard = spark.conf
      .get("spark.graft.prefixsum.keyguard", "false").toBoolean
    val base = Seq(min(col(orderCol).cast("double")).as("lo"),
      max(col(orderCol).cast("double")).as("hi"),
      count(lit(1)).as("n"), count(col(orderCol)).as("nk"))
    val aggs = if (guard) base :+ countDistinct(col(orderCol)).as("nd")
               else base
    val r = df.agg(aggs.head, aggs.tail: _*).collect()(0)
    val total = r.getLong(2)
    if (total == 0L) { d => d.withColumn("_pid", lit(0)) } // empty input
    else {
      require(r.getLong(3) == total,
        s"exclusivePrefixSum: order key '$orderCol' has " +
          s"${total - r.getLong(3)} null value(s) — every row needs a " +
          "non-null numeric key to receive a deterministic bucket/offset")
      if (guard) require(r.getLong(4) == total,
        s"exclusivePrefixSum: order key '$orderCol' has duplicates " +
          s"(${total} rows, ${r.getLong(4)} distinct) — prefixes would be " +
          "order-dependent and the wide-input join-back would multiply rows")
      val (lo, hi) = (r.getDouble(0), r.getDouble(1))
      val width = math.max((hi - lo) / n, java.lang.Double.MIN_NORMAL)
      d => d.withColumn("_pid",
        least(greatest(floor((col(orderCol).cast("double") - lit(lo)) /
          lit(width)), lit(0L)), lit((n - 1).toLong)).cast("int"))
    }
  }

  /** Distributed EXCLUSIVE prefix sum over `valueCol` in `orderCol` order —
    * the global atom-offset table. A bare `Window.orderBy` would collapse
    * everything into ONE task; this is the scalable two-pass form:
    * deterministic range buckets over the order key ([[bucketId]] — replay-
    * safe by construction), bucket-local cumulative sums (the window's own
    * hash shuffle on `_pid` co-locates each bucket), then broadcast
    * per-bucket base offsets. O(rows/buckets) per task, one tiny
    * driver collect of bucket totals.
    *
    * CACHE-FREE by design (r13): the per-bucket totals are aggregated from
    * the PRE-window bucketed frame — a map-side-combined groupBy that never
    * needs the cumsum column — so nothing is persisted and the window runs
    * exactly once, inside the caller's own action. The r12 form persisted
    * the windowed frame to share it between the totals collect and the
    * final join, which leaked one MEMORY_AND_DISK entry per call (TarSink,
    * packSequences, writePlan all call this); with deterministic buckets
    * every replay re-derives identical buckets and totals, so the narrow
    * re-scan is both cheaper than the cache materialization and safe.
    */
  def exclusivePrefixSum(df: DataFrame, orderCol: String, valueCol: String,
                         outCol: String = "offset",
                         numPartitions: Int = 0): DataFrame = {
    val extras = df.columns.filterNot(c => c == orderCol || c == valueCol)
    // Offsets are computed on the NARROW (orderCol, valueCol) projection —
    // the window shuffle and the totals pass never carry payload columns
    // (a wide corpus frame would otherwise pay a full-row materialization
    // just to number itself: measured 1.4× on ×1000 packSequences). Wide
    // inputs get the offsets joined back on the order key, which must be
    // UNIQUE per row — the same contract the cumsum itself already has
    // (duplicate keys would make the within-bucket order, and therefore
    // every prefix, nondeterministic).
    val offsets = prefixCore(df.select(col(orderCol), col(valueCol)),
      orderCol, valueCol, outCol, numPartitions)
    if (extras.isEmpty) offsets
    else df.join(offsets.select(col(orderCol), col(outCol)), Seq(orderCol))
  }

  private def prefixCore(df: DataFrame, orderCol: String, valueCol: String,
                         outCol: String, numPartitions: Int): DataFrame = {
    val spark = df.sparkSession
    val n = if (numPartitions > 0) numPartitions
            else spark.sessionState.conf.numShufflePartitions
    val bucketed = bucketId(df, orderCol, n)(df)
    // tiny driver-side pass over the PRE-window frame: one row per bucket,
    // partial-aggregated map-side (never needs the cumsum column)
    val totals = bucketed.groupBy(col("_pid"))
      .agg(sum(col(valueCol)).as("_tot"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
    val bases = totals.scanLeft(0L)(_ + _._2).zip(totals.map(_._1))
      .map { case (base, pid) => (pid, base) }
    import spark.implicits._
    val baseDf = bases.toSeq.toDF("_pid", "_base")
    // bucket-local INCLUSIVE cumsum (bucket-bounded window) — evaluated
    // once, in the caller's action; deterministic buckets keep the
    // collected bases valid under any recompute
    val w = Window.partitionBy(col("_pid")).orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    bucketed.withColumn("_cum", sum(col(valueCol)).over(w))
      .join(broadcast(baseDf), "_pid")
      .withColumn(outCol, col("_base") + col("_cum") - col(valueCol))
      .drop("_pid", "_cum", "_base")
  }

  /** Multi-column variant of [[exclusivePrefixSum]]: ALL the cumulative
    * sums ride ONE bucketing and one bucket-local window — cheaper than
    * chaining single-column calls, and the deterministic [[bucketId]]
    * makes chaining SAFE too (under the old sampled form, a second call
    * re-executing the first's lineage could re-draw boundaries — caught
    * by the KS-test cumulative counts drifting mid-stream in r11).
    */
  def exclusivePrefixSums(df: DataFrame, orderCol: String,
                          valueCols: Seq[String], outSuffix: String = "_off",
                          numPartitions: Int = 0): DataFrame = {
    require(valueCols.nonEmpty, "no value columns")
    val extras = df.columns
      .filterNot(c => c == orderCol || valueCols.contains(c))
    if (extras.nonEmpty) {
      // narrow-core + join-back, same reasoning as the single-column form
      val narrow = exclusivePrefixSums(
        df.select((orderCol +: valueCols).map(col): _*),
        orderCol, valueCols, outSuffix, numPartitions)
      return df.join(narrow.select(col(orderCol) +:
        valueCols.map(c => col(s"$c$outSuffix")): _*), Seq(orderCol))
    }
    val spark = df.sparkSession
    val n = if (numPartitions > 0) numPartitions
            else spark.sessionState.conf.numShufflePartitions
    val bucketed = bucketId(df, orderCol, n)(df)
    // per-bucket totals from the PRE-window frame (cache-free, same
    // reasoning as [[prefixCore]]): one map-side-combined groupBy
    val totals = bucketed.groupBy(col("_pid"))
      .agg(valueCols.map(c => sum(col(c)).as(s"_tot_$c")).head,
        valueCols.map(c => sum(col(c)).as(s"_tot_$c")).tail: _*)
      .collect()
      .map(r => r.getInt(0) -> valueCols.indices.map(i => r.getLong(i + 1)))
      .sortBy(_._1)
    val bases = totals.scanLeft(valueCols.map(_ => 0L).toIndexedSeq) {
      (acc, t) => acc.zip(t._2).map { case (a, b) => a + b }
    }.zip(totals.map(_._1)).map { case (base, pid) => (pid, base) }
    import spark.implicits._
    val baseDf = bases.toSeq.map { case (pid, bs) => (pid, bs.toArray) }
      .toDF("_pid", "_bases")
    val w = Window.partitionBy(col("_pid")).orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = valueCols.foldLeft(bucketed) { (d, c) =>
      d.withColumn(s"_cum_$c", sum(col(c)).over(w))
    }
    val joined = local.join(broadcast(baseDf), "_pid")
    val out0 = valueCols.zipWithIndex.foldLeft(joined) { case (d, (c, i)) =>
      d.withColumn(s"$c$outSuffix",
        element_at(col("_bases"), i + 1) + col(s"_cum_$c") - col(c))
    }
    out0.drop("_pid" +: "_bases" +: valueCols.map(c => s"_cum_$c"): _*)
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
