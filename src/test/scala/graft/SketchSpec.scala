package graft

import org.apache.spark.sql.functions._

import graft.operators.StatsOps

/** Sketch operators: the portable HLL's error bound across cardinalities
  * (incl. the linear-counting branch) and the GK-quantile degeneracy the
  * oracle gate relies on.
  */
class SketchSpec extends SparkSpec {

  test("hllDistinct: estimate within the 1.04/sqrt(m) band across cardinalities") {
    val s = spark
    import s.implicits._
    // p=12 → m=4096, sigma ≈ 1.6%; assert 3.5 sigma with deterministic data
    for (card <- Seq(500, 5000, 50000)) {
      val df = (0 until card * 3).map(i => ("g", s"v${i % card}")).toDF("g", "v")
      val est = StatsOps.hllDistinct(df, "g", "v", p = 12)
        .collect()(0).getDouble(1)
      val err = math.abs(est - card) / card
      assert(err < 0.056, s"cardinality $card estimated $est (err $err)")
    }
  }

  test("hllDistinct: tiny cardinality takes the linear-counting branch near-exactly") {
    val s = spark
    import s.implicits._
    val df = (0 until 1000).map(i => ("g", s"k${i % 7}")).toDF("g", "v")
    val est = StatsOps.hllDistinct(df, "g", "v", p = 12).collect()(0).getDouble(1)
    // linear counting with 7 occupied of 4096 registers: error well under 1
    assert(math.abs(est - 7.0) < 0.5, s"expected ~7, got $est")
  }

  test("hllDistinct: insensitive to duplication factor and partitioning") {
    val s = spark
    import s.implicits._
    val once = (0 until 300).map(i => ("g", s"x$i")).toDF("g", "v")
    val thrice = (0 until 900).map(i => ("g", s"x${i % 300}")).toDF("g", "v")
      .repartition(13)
    val e1 = StatsOps.hllDistinct(once, "g", "v").collect()(0).getDouble(1)
    val e2 = StatsOps.hllDistinct(thrice, "g", "v").collect()(0).getDouble(1)
    assert(e1 == e2, s"duplicates/partitioning changed the sketch: $e1 vs $e2")
  }

  test("approxGroupQuantiles: accuracy > n degenerates to the exact order statistic") {
    val s = spark
    import s.implicits._
    val df = (1 to 1000).map(v => ("g", v.toDouble)).toDF("g", "v")
    val r = StatsOps.approxGroupQuantiles(df, "g", "v", Seq(0.25, 0.5, 0.95), 100000)
      .collect()(0)
    // values 1..1000: rank ceil(q*1000) → exactly 250, 500, 950
    assert(r.getDouble(2) == 250.0 && r.getDouble(3) == 500.0 &&
      r.getDouble(4) == 950.0, r.toString)
  }

  test("approxGroupQuantiles: production accuracy stays within the rank bound") {
    val s = spark
    import s.implicits._
    val df = (1 to 20000).map(v => ("g", v.toDouble)).toDF("g", "v")
    val r = StatsOps.approxGroupQuantiles(df, "g", "v", Seq(0.5), 100)
      .collect()(0)
    // epsilon = 1/accuracy → rank error ≤ n/100 = 200 positions
    assert(math.abs(r.getDouble(2) - 10000.0) <= 200.0, r.toString)
  }

  test("kmvSketch: bounded to k, sorted ascending, duplication/partition invariant") {
    val s = spark
    import s.implicits._
    val once = (0 until 500).map(i => ("g", s"x$i")).toDF("g", "v")
    val thrice = (0 until 1500).map(i => ("g", s"x${i % 500}")).toDF("g", "v")
      .repartition(13)
    val s1 = StatsOps.kmvSketch(once, "g", "v", 64).collect()(0).getSeq[Long](1)
    val s2 = StatsOps.kmvSketch(thrice, "g", "v", 64).collect()(0).getSeq[Long](1)
    assert(s1 == s2, "duplicates/partitioning changed the sketch")
    assert(s1.length == 64 && s1 == s1.sorted && s1.distinct == s1)
  }

  test("kmvSketch + thetaSetOps: exact when sketches are not full") {
    val s = spark
    import s.implicits._
    // A = {0..59}, B = {40..99}: |A|=60, |B|=60, ∩=20, ∪=100, A∖B=40
    val rows = (0 until 60).map(i => ("a", s"v$i")) ++
      (40 until 100).map(i => ("b", s"v$i"))
    val df = rows.toDF("set", "v")
    val r = StatsOps.thetaSetOps(StatsOps.kmvSketch(df, "set", "v", 256), 256)
      .collect()(0)
    assert(r.getDouble(2) == 60.0 && r.getDouble(3) == 60.0)
    assert(r.getDouble(4) == 100.0 && r.getDouble(5) == 20.0 &&
      r.getDouble(6) == 40.0, r.toString)
  }

  test("thetaSetOps: full sketches estimate within the KMV error band") {
    val s = spark
    import s.implicits._
    // A = {0..4999}, B = {2500..7499}: truth n=5000 each, ∩=2500, ∪=7500
    val rows = (0 until 5000).map(i => ("a", s"k$i")) ++
      (2500 until 7500).map(i => ("b", s"k$i"))
    val k = 256
    val r = StatsOps.thetaSetOps(
      StatsOps.kmvSketch(rows.toDF("set", "v"), "set", "v", k), k).collect()(0)
    // sigma ≈ 1/sqrt(k-2) ≈ 6.3%; assert 4 sigma on each estimate
    def ok(est: Double, truth: Double) =
      math.abs(est - truth) / truth < 0.25
    assert(ok(r.getDouble(2), 5000) && ok(r.getDouble(3), 5000), r.toString)
    assert(ok(r.getDouble(4), 7500) && ok(r.getDouble(5), 2500) &&
      ok(r.getDouble(6), 2500), r.toString)
  }

  test("cmsHeavyHitters: estimate >= exact always; exact when the width kills collisions") {
    val s = spark
    import s.implicits._
    // skewed stream: key k_i appears i times, i in 1..60
    val rows = (1 to 60).flatMap(i => Seq.fill(i)(s"k$i")).map(Tuple1(_))
    val df = rows.toDF("k")
    val hh = StatsOps.cmsHeavyHitters(df, "k", d = 3, w = 8192L, threshold = 1L)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(hh.size == 60)
    (1 to 60).foreach { i =>
      val (n, e) = hh(s"k$i")
      assert(n == i.toLong, s"exact count for k$i")
      assert(e >= n, s"CMS must never underestimate k$i")
    }
    // 60 keys into 3×8192 buckets: collisions are overwhelmingly unlikely
    // with this fixed hash — the estimates are exact here
    assert((1 to 60).forall(i => hh(s"k$i")._2 == i.toLong))
    // tight width forces collisions: estimates inflate but never drop
    val tight = StatsOps.cmsHeavyHitters(df, "k", d = 2, w = 4L, threshold = 1L)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(tight.length == 60 && tight.forall { case (_, n, e) => e >= n })
    assert(tight.exists { case (_, n, e) => e > n }, "w=4 must collide")
  }
}
