package graft

import org.apache.spark.sql.functions._

import graft.graph.GraphOps

/** Atomic-graph operators: distributed prefix-sum offsets, info inventory. */
class GraphSpec extends SparkSpec {

  test("exclusivePrefixSum equals a sequential scan, under any partitioning") {
    val s = spark
    import s.implicits._
    val vals = (1 to 97).map(i => (i.toLong, (i * 7 % 13 + 1).toLong))
    val df = vals.toDF("sys_id", "natoms").repartition(7)
    for (parts <- Seq(1, 3, 8)) {
      val got = GraphOps.exclusivePrefixSum(df, "sys_id", "natoms", numPartitions = parts)
        .select("sys_id", "offset").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      var acc = 0L
      vals.foreach { case (id, n) =>
        assert(got(id) == acc, s"sys $id at $parts partitions")
        acc += n
      }
    }
  }

  test("exclusivePrefixSum(s) leave no cache entries behind (r12 leak)") {
    val s = spark
    import s.implicits._
    val df = (1 to 50).map(i => (i.toLong, i.toLong, s"payload_$i"))
      .toDF("sys_id", "natoms", "payload")
    val before = s.sparkContext.getPersistentRDDs.size
    (1 to 3).foreach { _ =>
      GraphOps.exclusivePrefixSum(df, "sys_id", "natoms").count()
      GraphOps.exclusivePrefixSums(df, "sys_id", Seq("natoms")).count()
    }
    val after = s.sparkContext.getPersistentRDDs.size
    assert(after == before,
      s"prefix sums leaked ${after - before} persisted RDD(s)")
  }

  test("prefix-sum key guard: null and duplicate order keys fail loudly") {
    val s = spark
    import s.implicits._
    // nulls always fail (the join-back would silently drop their rows)
    val withNull = Seq((Some(1L), 2L), (None, 3L), (Some(4L), 5L))
      .toDF("sys_id", "natoms")
    val eNull = intercept[IllegalArgumentException] {
      GraphOps.exclusivePrefixSum(withNull, "sys_id", "natoms").count()
    }
    assert(eNull.getMessage.contains("null"))
    // duplicates fail when the guard conf is on (it is, in the test session)
    val withDup = Seq((1L, 2L), (1L, 3L), (4L, 5L)).toDF("sys_id", "natoms")
    val eDup = intercept[IllegalArgumentException] {
      GraphOps.exclusivePrefixSums(withDup, "sys_id", Seq("natoms")).count()
    }
    assert(eDup.getMessage.contains("duplicates"))
    // guard off: duplicate keys are the caller's responsibility again
    s.conf.set("spark.graft.prefixsum.keyguard", "false")
    try GraphOps.exclusivePrefixSum(withDup, "sys_id", "natoms").count()
    finally s.conf.set("spark.graft.prefixsum.keyguard", "true")
  }

  test("writePlan regions are disjoint and contiguous") {
    val s = spark
    import s.implicits._
    val systems = Seq(
      (1L, Seq(1, 1, 8)), (2L, Seq(6)), (3L, Seq(8, 8))
    ).toDF("sys_id", "atomic_numbers")
    val plan = GraphOps.writePlan(systems).orderBy("sys_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(plan.toSeq == Seq((1L, 3L, 0L), (2L, 1L, 3L), (3L, 2L, 4L)))
  }

  test("atomicInfo: counts, species, composition") {
    val s = spark
    import s.implicits._
    val systems = Seq(
      (1L, Seq(1, 1, 8), Seq(0, 1, 2), Seq(true, true, true), -76.4)
    ).toDF("sys_id", "atomic_numbers", "edge_index_src", "pbc", "energy")
    val r = GraphOps.atomicInfo(systems).collect()(0)
    assert(r.getAs[Int]("n_atoms") == 3)
    assert(r.getAs[Int]("n_edges") == 3)
    assert(r.getAs[scala.collection.Seq[Int]]("species").toSeq == Seq(1, 8))
    assert(r.getAs[Int]("n_species") == 2)
  }

  test("perAtomFieldStats over exploded array columns") {
    val s = spark
    import s.implicits._
    val systems = Seq(
      (1L, Seq(1.0, 2.0)), (2L, Seq(3.0, 4.0, 5.0))
    ).toDF("sys_id", "forces")
    val r = GraphOps.perAtomFieldStats(systems, "forces").collect()(0)
    assert(r.getAs[Long]("n") == 5 && r.getAs[Double]("mean") == 3.0)
    assert(r.getAs[Double]("min") == 1.0 && r.getAs[Double]("max") == 5.0)
  }

  /** Reference PageRank on driver-side maps, for golden comparison. */
  private def refPageRank(edges: Seq[(Long, Long)], iters: Int,
                          d: Double = 0.85): Map[Long, Double] = {
    val e = edges.filter(p => p._1 != p._2).distinct
    val nodes = (e.map(_._1) ++ e.map(_._2)).distinct.sorted
    val n = nodes.length
    val out = e.groupBy(_._1).view.mapValues(_.length.toDouble).toMap
    var r = nodes.map(_ -> 1.0 / n).toMap
    (1 to iters).foreach { _ =>
      val dang = nodes.filterNot(out.contains).map(r).sum
      val contrib = e.groupBy(_._2).view.mapValues(
        _.map(p => r(p._1) / out(p._1)).sum).toMap
      r = nodes.map(v => v ->
        ((1.0 - d) / n + d * (contrib.getOrElse(v, 0.0) + dang / n))).toMap
    }
    r
  }

  test("pageRank matches the sequential reference and conserves mass") {
    val s = spark
    import s.implicits._
    // 1→2, 1→3, 2→3, 3→1, plus dangling sink 4 (3→4, no out-edges),
    // a self-loop and a duplicate edge that must be dropped
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 1L), (3L, 4L),
      (2L, 2L), (1L, 2L))
    val got = GraphOps.pageRank(edges.toDF("src", "dst"), "src", "dst",
      iterations = 8).collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val want = refPageRank(edges, 8)
    assert(got.keySet === want.keySet)
    got.foreach { case (node, rank) =>
      assert(math.abs(rank - want(node)) < 1e-12, s"node $node")
    }
    // dangling redistribution keeps total mass at 1
    assert(math.abs(got.values.sum - 1.0) < 1e-9)
    // the hub pointed at by everything outranks the pure sink
    assert(got(3L) > got(4L))
  }

  test("pageRank on a cycle is uniform") {
    val s = spark
    import s.implicits._
    val got = GraphOps.pageRank(
      Seq((1L, 2L), (2L, 3L), (3L, 1L)).toDF("src", "dst"), "src", "dst",
      iterations = 3).collect()
    got.foreach(r => assert(math.abs(r.getDouble(1) - 1.0 / 3) < 1e-12))
  }

  test("shortestPaths: BFS hops, cycle convergence, unreachable excluded") {
    val s = spark
    import s.implicits._
    // 0→1→2→0 cycle, 2→3, 3→4; 9→0 points INTO the source (9 unreachable);
    // 7→8 disconnected
    val edges = Seq((0L, 1L), (1L, 2L), (2L, 0L), (2L, 3L), (3L, 4L),
      (9L, 0L), (7L, 8L)).toDF("src", "dst")
    val got = graft.graph.GraphOps.shortestPaths(edges, "src", "dst", Seq(0L))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(0L -> 0L, 1L -> 1L, 2L -> 2L, 3L -> 3L, 4L -> 4L),
      got.toString)
    // multi-source: min over sources wins
    val multi = graft.graph.GraphOps.shortestPaths(edges, "src", "dst",
      Seq(0L, 3L)).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(multi(4L) == 1L && multi(3L) == 0L && multi(1L) == 1L, multi.toString)
  }
}
