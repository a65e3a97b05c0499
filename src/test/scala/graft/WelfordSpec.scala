package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.functions.{Welford, WelfordState}

/** Welford/Chan moment-algebra laws (reference `stats.py:675-836`): merge of
  * shard states must equal a straight recompute, under any split, any order.
  * Driven by plain ScalaCheck properties (no scalatestplus bridge needed).
  */
class WelfordSpec extends SparkSpec {

  private def fold(xs: Seq[Double]): WelfordState =
    xs.foldLeft(WelfordState.zero)(WelfordState.update)

  private def approx(a: Double, b: Double, tol: Double = 1e-8): Boolean =
    (a.isNaN && b.isNaN) || math.abs(a - b) <= tol * math.max(1.0, math.max(math.abs(a), math.abs(b)))

  private def statesApprox(a: WelfordState, b: WelfordState): Boolean =
    a.n == b.n && approx(a.mean, b.mean) && approx(a.m2, b.m2) &&
      approx(a.m3, b.m3, 1e-6) && approx(a.m4, b.m4, 1e-6) &&
      a.min == b.min && a.max == b.max && approx(a.absSum, b.absSum)

  private val xsGen: Gen[List[Double]] = Gen.listOf(Gen.chooseNum(-1e3, 1e3))

  private def check(p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), p)
    assert(res.passed, res.status.toString)
  }

  test("merge(fold(a), fold(b)) == fold(a ++ b)") {
    check(Prop.forAll(xsGen, xsGen) { (a, b) =>
      statesApprox(WelfordState.merge(fold(a), fold(b)), fold(a ++ b))
    })
  }

  test("merge is commutative") {
    check(Prop.forAll(xsGen, xsGen) { (a, b) =>
      statesApprox(
        WelfordState.merge(fold(a), fold(b)),
        WelfordState.merge(fold(b), fold(a)))
    })
  }

  test("merge is associative (within float tolerance)") {
    check(Prop.forAll(xsGen, xsGen, xsGen) { (a, b, c) =>
      statesApprox(
        WelfordState.merge(WelfordState.merge(fold(a), fold(b)), fold(c)),
        WelfordState.merge(fold(a), WelfordState.merge(fold(b), fold(c))))
    })
  }

  test("zero is the merge identity") {
    check(Prop.forAll(xsGen) { a =>
      val s = fold(a)
      statesApprox(WelfordState.merge(s, WelfordState.zero), s) &&
        statesApprox(WelfordState.merge(WelfordState.zero, s), s)
    })
  }

  test("derived stats match direct formulas on a known sample") {
    // x = [2, 4, 4, 4, 5, 5, 7, 9]: mean 5, var_pop 4 (classic example)
    val s = fold(Seq(2, 4, 4, 4, 5, 5, 7, 9).map(_.toDouble))
    assert(s.n == 8)
    assert(approx(s.mean, 5.0))
    assert(approx(s.variancePop, 4.0))
    assert(approx(s.stddevPop, 2.0))
    assert(approx(s.skewness, 0.65625))          // m3=42 → g1 = (42/8)/4^1.5
    assert(approx(s.kurtosis, -0.21875))         // m4=356 → g2 = (356/8)/16 - 3
    assert(s.min == 2.0 && s.max == 9.0)
    assert(approx(s.absMean, 5.0))
  }

  test("deterministicState matches the reference formula sequence BIT-FOR-BIT") {
    val s = spark
    import s.implicits._
    // (shard, order, value) with shards of uneven sizes; the reference
    // sequence is: per-shard in-order online update, then left-to-right
    // Chan merge in shard order
    val rowsGen = Gen.listOf(for {
      sh <- Gen.choose(0, 4)
      v <- Gen.chooseNum(-1e3, 1e3)
    } yield (sh, v)).map(_.zipWithIndex.map { case ((sh, v), i) => (sh, i, v) })
    def bitEq(a: WelfordState, b: WelfordState): Boolean = {
      def d(x: Double, y: Double) =
        java.lang.Double.doubleToRawLongBits(x) == java.lang.Double.doubleToRawLongBits(y)
      a.n == b.n && d(a.mean, b.mean) && d(a.m2, b.m2) && d(a.m3, b.m3) &&
        d(a.m4, b.m4) && d(a.min, b.min) && d(a.max, b.max) && d(a.absSum, b.absSum)
    }
    val p = Prop.forAllNoShrink(rowsGen) { rows =>
      val reference = rows.groupBy(_._1).toSeq.sortBy(_._1)
        .map { case (_, rs) => fold(rs.sortBy(_._2).map(_._3)) }
        .foldLeft(WelfordState.zero)(WelfordState.merge)
      val df = rows.toDF("shard", "ord", "v").repartition(7) // adversarial layout
      val got = Welford.deterministicState(df, "shard", "ord", "v")
      bitEq(got, reference)
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(30), p)
    assert(res.passed, res.status.toString)
  }

  test("deterministic mode is BIT-STABLE across shuffle-partition counts; default mode tracks within tolerance") {
    val s = spark
    import s.implicits._
    // same logical data laid out three different ways: the deterministic
    // mode must emit the SAME raw bits regardless (its repartition-by-shard
    // + in-shard sort erases the incoming layout), while the default
    // Aggregator's merge TREE may differ — exact fields stay exact, the
    // float moments agree to documented relative tolerance
    val rows = (1 to 2000).map { i =>
      (i % 5, i, math.sin(i * 0.7) * 1e3 + math.cos(i * 1.3)) // uneven magnitudes
    }
    def bits(st: WelfordState): Seq[Long] = Seq(
      st.n, java.lang.Double.doubleToRawLongBits(st.mean),
      java.lang.Double.doubleToRawLongBits(st.m2),
      java.lang.Double.doubleToRawLongBits(st.m3),
      java.lang.Double.doubleToRawLongBits(st.m4),
      java.lang.Double.doubleToRawLongBits(st.min),
      java.lang.Double.doubleToRawLongBits(st.max),
      java.lang.Double.doubleToRawLongBits(st.absSum))
    val sweep = Seq(1, 7, 32).map { np =>
      val df = rows.toDF("shard", "ord", "v").repartition(np)
      bits(Welford.deterministicState(df, "shard", "ord", "v"))
    }
    assert(sweep.distinct.size == 1,
      s"deterministic mode drifted across partition counts: $sweep")

    val defaults = Seq(1, 7, 32).map { np =>
      val df = rows.toDF("shard", "ord", "v").repartition(np)
      df.agg(Welford(org.apache.spark.sql.functions.col("v")).as("w"))
        .selectExpr("w.n", "w.mean", "w.m2", "w.m3", "w.m4", "w.min", "w.max", "w.absSum")
        .head()
    }
    val ref = defaults.head
    defaults.tail.foreach { r =>
      assert(r.getLong(0) == ref.getLong(0))          // n exact
      assert(r.getDouble(5) == ref.getDouble(5))      // min exact
      assert(r.getDouble(6) == ref.getDouble(6))      // max exact
      // float moments: relative 1e-9 across merge trees (documented
      // tolerance of the default mode; use deterministicState for bits)
      for (i <- Seq(1, 2, 3, 4, 7)) {
        val (a, b) = (r.getDouble(i), ref.getDouble(i))
        assert(math.abs(a - b) <= 1e-9 * math.max(1.0, math.max(math.abs(a), math.abs(b))),
          s"field $i: $a vs $b")
      }
    }
  }

  test("Spark UDAF partial+final agg equals driver-side fold") {
    val s = spark
    import s.implicits._
    val xs = (1 to 1000).map(i => (i % 7, math.sin(i) * 100))
    val df = xs.toDF("g", "x").repartition(8)
    val rows = df.groupBy("g").agg(Welford(org.apache.spark.sql.functions.col("x")).as("w"))
      .selectExpr("g", "w.n", "w.mean", "w.m2", "w.min", "w.max").collect()
    assert(rows.length == 7)
    rows.foreach { r =>
      val expect = fold(xs.filter(_._1 == r.getInt(0)).map(_._2))
      assert(r.getLong(1) == expect.n)
      assert(approx(r.getDouble(2), expect.mean))
      assert(approx(r.getDouble(3), expect.m2, 1e-6))
      assert(r.getDouble(4) == expect.min && r.getDouble(5) == expect.max)
    }
  }
}
