package graft

import org.apache.spark.sql.functions._

import graft.functions.Physics
import graft.operators.{RelationalOps, StatsOps, TextOps}

/** Relational combinators, stats family, physics kernels, and text analysis on
  * tiny literal frames with hand-computed golden values.
  */
class OperatorSpec extends SparkSpec {

  test("remaining: anti-join drops completed work") {
    val s = spark
    import s.implicits._
    val work = (1 to 10).toDF("idx")
    val done = Seq(2, 4, 6).toDF("idx")
    val left = RelationalOps.remaining(work, done, "idx").collect().map(_.getInt(0)).toSet
    assert(left == Set(1, 3, 5, 7, 8, 9, 10))
  }

  test("asOfJoin: greatest right ts <= left ts per key; equal ts matches") {
    val s = spark
    import s.implicits._
    val left = Seq((1L, 10L, "a"), (1L, 20L, "b"), (1L, 5L, "c"), (2L, 7L, "d"))
      .toDF("k", "t", "tag")
    val right = Seq((1L, 10L, 1.5), (1L, 15L, 2.5), (3L, 1L, 9.9))
      .toDF("rk", "rt", "v")
    val out = RelationalOps.asOfJoin(left, "k", "t", right, "rk", "rt", "v")
      .collect().map(r => r.getString(2) ->
        (if (r.isNullAt(3)) Double.NaN else r.getDouble(3))).toMap
    assert(out("a") == 1.5)           // equal ts matches (>= semantics)
    assert(out("b") == 2.5)           // most recent of two priors
    assert(out("c").isNaN)            // no prior right row
    assert(out("d").isNaN)            // key absent on the right
    assert(out.size == 4)             // left rows all survive exactly once
  }

  test("asOfJoin: a matched null-valued right row yields null (no fallback)") {
    val s = spark
    import s.implicits._
    val left = Seq((1L, 20L, "x"), (1L, 30L, "y")).toDF("k", "t", "tag")
    val right = Seq((1L, 5L, Some(7.5)), (1L, 15L, None), (1L, 25L, Some(9.0)))
      .toDF("rk", "rt", "v")
    val out = RelationalOps.asOfJoin(left, "k", "t", right, "rk", "rt", "v")
      .collect().map(r => r.getString(2) ->
        (if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap
    // ts=20 matches the null-valued row at 15 — DuckDB ASOF returns ITS
    // (null) value, not the older 7.5
    assert(out("x").isEmpty)
    assert(out("y").contains(9.0))
  }

  test("asOfJoin: randomized equivalence with the brute-force definition") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(20260813L)
    val left = (1 to 120).map(i =>
      (i.toLong, rnd.nextInt(8).toLong, rnd.nextInt(1000).toLong))
    val right = (1 to 60).map(_ =>
      (rnd.nextInt(8).toLong, rnd.nextInt(1000).toLong, rnd.nextInt(500).toDouble))
      .distinct.groupBy(r => (r._1, r._2)) // unique per (key, ts): max value
      .map { case ((k, t), rs) => (k, t, rs.map(_._3).max) }.toSeq
    val out = RelationalOps.asOfJoin(
      left.toDF("lid", "k", "t"), "k", "t",
      right.toDF("rk", "rt", "v"), "rk", "rt", "v")
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap
    left.foreach { case (lid, k, t) =>
      val expect = right.filter(r => r._1 == k && r._2 <= t)
        .sortBy(_._2).lastOption.map(_._3)
      assert(out(lid) == expect, s"row $lid key $k ts $t")
    }
  }

  test("rangeJoin: randomized equivalence with the cross-filter definition") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(424242L)
    val pts = (1 to 150).map(i => (i.toLong, rnd.nextInt(400).toLong))
    val ivs = (1 to 40).map(i =>
      { val st = rnd.nextInt(400).toLong; (i, st, st + rnd.nextInt(25)) })
    val out = RelationalOps.rangeJoin(
      pts.toDF("pid", "p"), "p",
      ivs.toDF("iv", "s0", "e0"), "s0", "e0", bucketWidth = 25L)
      .select("pid", "iv").collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    val brute = (for { (pid, p) <- pts; (iv, s0, e0) <- ivs
                       if p >= s0 && p <= e0 } yield (pid, iv)).toSet
    assert(out == brute)
  }

  test("rangeJoin: bucket explode + containment filter, no duplicate pairs") {
    val s = spark
    import s.implicits._
    val pts = Seq((1L, 0L), (2L, 9L), (3L, 10L), (4L, 25L), (5L, 39L))
      .toDF("pid", "p")
    // interval B straddles the bucket-10 boundary; C covers three buckets
    val ivs = Seq(("A", 0L, 4L), ("B", 8L, 12L), ("C", 5L, 26L))
      .toDF("iv", "s0", "e0")
    val out = RelationalOps.rangeJoin(pts, "p", ivs, "s0", "e0", bucketWidth = 10L)
      .select("pid", "iv").collect().map(r => (r.getLong(0), r.getString(1)))
    assert(out.length == out.distinct.length) // multi-bucket intervals don't dup
    assert(out.toSet == Set((1L, "A"), (2L, "B"), (3L, "B"), (2L, "C"),
      (3L, "C"), (4L, "C")))
  }

  test("packSequences: concat-and-cut offsets, window spans, empty docs") {
    val s = spark
    import s.implicits._
    val df = Seq((1L, 300L), (2L, 300L), (3L, 0L), (4L, 1024L))
      .toDF("doc_id", "n_toks")
    val r = graft.operators.CurationOps.packSequences(df, "doc_id", "n_toks", 512L)
      .collect().map(x => x.getLong(0) ->
        ((x.getLong(2), x.getLong(3), x.getLong(4)))).toMap
    assert(r(1L) == ((0L, 0L, 1L)))      // fits window 0
    assert(r(2L) == ((300L, 0L, 2L)))    // straddles windows 0-1
    assert(r(3L) == ((600L, 1L, 0L)))    // empty doc spans nothing
    assert(r(4L) == ((600L, 1L, 3L)))    // 600..1623 spans windows 1,2,3
  }

  test("histogram: floor binning incl. negatives; correlationMatrix exact") {
    val s = spark
    import s.implicits._
    val df = Seq(("a", -0.5), ("a", 0.0), ("a", 9.99), ("a", 10.0), ("b", 25.0))
      .toDF("g", "v")
    val h = StatsOps.histogram(df, "g", "v", binWidth = 10.0).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(h(("a", -1L)) == 1 && h(("a", 0L)) == 2 && h(("a", 1L)) == 1)
    assert(h(("b", 2L)) == 1)
    val lin = (1 to 10).map(i => (i.toDouble, 3.0 * i + 1, -2.0 * i))
      .toDF("x", "y", "z")
    val c = StatsOps.correlationMatrix(lin, Seq("x", "y", "z")).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    assert(math.abs(c(("x", "y")) - 1.0) < 1e-12)  // perfectly linear
    assert(math.abs(c(("x", "z")) + 1.0) < 1e-12)  // perfectly anti-linear
    assert(c.size == 3)
  }

  test("profileColumns: one-pass numeric and string profiles with nulls") {
    val s = spark
    import s.implicits._
    val df = Seq((Option(1.0), "a"), (Option.empty[Double], "b"), (Option(3.0), "b"))
      .toDF("v", "s")
    val p = StatsOps.profileColumns(df, Seq("v", "s")).collect()
      .map(r => r.getString(0) -> r).toMap
    val v = p("v")
    assert(v.getLong(1) == 3 && v.getLong(2) == 1 && v.getLong(3) == 2)
    assert(v.getDouble(4) == 1.0 && v.getDouble(5) == 3.0 && v.getDouble(6) == 2.0)
    assert(v.isNullAt(7) && v.isNullAt(8))
    val st = p("s")
    assert(st.getLong(2) == 0 && st.getLong(3) == 2)
    assert(st.isNullAt(4) && st.getString(7) == "a" && st.getString(8) == "b")
  }

  test("zScoreFilter: outliers drop, zero-variance groups keep all") {
    val s = spark
    import s.implicits._
    // group a: mean 0, the 100.0 is far outside 2 sigma; group b constant
    val df = (Seq.fill(20)(("a", 1.0)) ++ Seq.fill(20)(("a", -1.0)) ++
      Seq(("a", 100.0)) ++ Seq.fill(3)(("b", 7.0))).toDF("g", "v")
    val kept = graft.operators.CurationOps.zScoreFilter(df, "g", "v", maxZ = 2.0)
      .groupBy("g").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(kept("a") == 40L) // the outlier dropped, all +-1 rows kept
    assert(kept("b") == 3L)  // sd = 0 -> keep everything
  }

  test("weightedSample: k rows, dense ranks, partitioning-independent") {
    val s = spark
    import s.implicits._
    // the two zero/negative-weight rows must never hijack the sample
    val df = ((1L to 200L).map(i => (i, (i % 7 + 1).toDouble)) ++
      Seq((900L, 0.0), (901L, -3.0))).toDF("id", "wt")
    val a = graft.operators.CurationOps.weightedSample(df, "id", "wt", k = 20)
      .select("id", "rank").collect().map(r => (r.getLong(0), r.getInt(1)))
    assert(a.length == 20 && a.map(_._2).sorted.toSeq == (1 to 20))
    assert(!a.exists(x => x._1 >= 900L), "non-positive weights must drop")
    // pure row function: identical under a different partitioning
    val b = graft.operators.CurationOps
      .weightedSample(df.repartition(7), "id", "wt", k = 20)
      .select("id", "rank").collect().map(r => (r.getLong(0), r.getInt(1)))
    assert(a.sortBy(_._2).toSeq == b.sortBy(_._2).toSeq)
  }

  test("perplexityBuckets: analytic perplexities, tertile boundaries, head<middle<tail") {
    val s = spark
    import s.implicits._
    // corpus counts: a=3, b=1, c=2, N=6 → token logp ln(1/2), ln(1/6), ln(1/3)
    val docs = Seq((1L, "a a"), (2L, "a b"), (3L, "c c")).toDF("doc_id", "text")
    val r = graft.operators.TextOps.perplexityBuckets(docs, "doc_id", "text")
      .collect().map(x => x.getLong(0) -> ((x.getDouble(2), x.getString(3)))).toMap
    // the operator's exact arithmetic: round the mean log-prob, exp, round
    def pp(logps: Double*): Double = {
      val lr = math.rint((logps.sum / logps.size + 1e-9) * 1e4) / 1e4
      math.rint((math.exp(-lr) + 1e-9) * 1e4) / 1e4
    }
    assert(r(1L)._1 == pp(math.log(0.5), math.log(0.5)))             // ≈ 2
    assert(r(3L)._1 == pp(math.log(1.0 / 3), math.log(1.0 / 3)))    // ≈ 3
    assert(r(2L)._1 == pp(math.log(0.5), math.log(1.0 / 6)))        // ≈ √12
    assert(r(1L)._2 == "head" && r(3L)._2 == "middle" && r(2L)._2 == "tail")
  }

  test("mixSources: full epochs replicate exactly, fractional epoch is a hash subset") {
    val s = spark
    import s.implicits._
    val df = (1L to 400L).map(i => (i, if (i % 2 == 0) "hi" else "lo", i))
      .toDF("doc_id", "src", "payload")
    val mixed = graft.operators.CurationOps.mixSources(
      df, "src", "doc_id", Map("hi" -> 2.5, "lo" -> 0.25))
    val byEpoch = mixed.groupBy("src", "epoch").count().collect()
      .map(r => (r.getString(0), r.getInt(1)) -> r.getLong(2)).toMap
    // hi (w=2.5): epochs 0 and 1 carry all 200 rows; epoch 2 a strict subset
    assert(byEpoch(("hi", 0)) == 200L && byEpoch(("hi", 1)) == 200L)
    assert(byEpoch(("hi", 2)) > 0L && byEpoch(("hi", 2)) < 200L)
    // lo (w=0.25): only the fractional epoch 0, a strict subset of 200
    assert(byEpoch(("lo", 0)) > 0L && byEpoch(("lo", 0)) < 200L)
    assert(byEpoch.keys.forall { case (src, e) =>
      if (src == "hi") e <= 2 else e == 0 })
    // unlisted sources drop; a different partitioning changes nothing
    assert(graft.operators.CurationOps.mixSources(
      df, "src", "doc_id", Map("hi" -> 1.0)).select("epoch").distinct().count() == 1L)
    val again = graft.operators.CurationOps.mixSources(
      df.repartition(7), "src", "doc_id", Map("hi" -> 2.5, "lo" -> 0.25))
      .groupBy("src", "epoch").count().collect()
      .map(r => (r.getString(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert(again == byEpoch)
  }

  test("groupQuantiles: exact linear-interpolation values") {
    val s = spark
    import s.implicits._
    val df = Seq.tabulate(5)(i => ("a", (i + 1).toDouble)) :+ (("b", 10.0))
    val r = StatsOps.groupQuantiles(df.toDF("g", "v"), "g", "v",
      Seq(0.25, 0.5, 0.75, 0.95))
      .collect().map(x => x.getString(0) ->
        ((x.getLong(1), x.getDouble(2), x.getDouble(3), x.getDouble(4), x.getDouble(5))))
      .toMap
    assert(r("a") == ((5L, 2.0, 3.0, 4.0, 4.8))) // idx p*(n-1); 0.95*4 = 3.8
    assert(r("b") == ((1L, 10.0, 10.0, 10.0, 10.0)))
  }

  test("passageStats: corpus-wide passage counts, remainder dropped") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (1L, "a b c d e f"),   // passages "a b c", "d e f"
      (2L, "a b c x y z w"), // passages "a b c", "x y z"; trailing "w" dropped
      (3L, "tiny")           // < width → no passages, row absent
    ).toDF("doc_id", "text")
    val r = graft.operators.DedupOps.passageStats(docs, "doc_id", "text", width = 3)
      .collect().map(x => x.getLong(0) -> ((x.getLong(1), x.getLong(2)))).toMap
    assert(r(1L) == ((2L, 1L))) // "a b c" repeats across docs
    assert(r(2L) == ((2L, 1L)))
    assert(!r.contains(3L))
  }

  test("tfidfTopTerms: smooth-idf scores, deterministic tie order") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (1L, "x x y common"),
      (2L, "y z common"),
      (3L, "common common z")).toDF("doc_id", "text")
    val r = TextOps.tfidfTopTerms(docs, "doc_id", "text", k = 2)
      .orderBy("doc_id", "rank").collect()
      .map(x => (x.getLong(0), x.getInt(1), x.getString(2), x.getDouble(3)))
    def idf(df: Int): Double = math.log(4.0 / (df + 1.0)) + 1.0
    // doc 1: x has tf 2 df 1 → top; y tf 1 df 2 beats common tf 1 df 3
    assert(r(0) == ((1L, 1, "x", 2 * idf(1))))
    assert(r(1) == ((1L, 2, "y", idf(2))))
    // doc 2: y and z tie exactly (tf 1, df 2) → term order breaks the tie
    assert(r(2)._3 == "y" && r(3)._3 == "z" && r(2)._4 == r(3)._4)
  }

  test("canonicalEdges: undirected dedup, self-loops dropped") {
    val s = spark
    import s.implicits._
    val df = Seq((1, 2), (2, 1), (3, 3), (1, 3)).toDF("a", "b")
    val e = RelationalOps.canonicalEdges(df, "a", "b").collect()
      .map(r => (r.getInt(0), r.getInt(1))).toSet
    assert(e == Set((1, 2), (1, 3)))
  }

  test("keepFirst: survivor is min order key, dup count right") {
    val s = spark
    import s.implicits._
    val df = Seq(("k", 5L), ("k", 3L), ("k", 9L), ("j", 1L)).toDF("key", "ord")
    val r = RelationalOps.keepFirst(df, Seq("key"), "ord").collect()
      .map(x => x.getString(0) -> ((x.getLong(1), x.getLong(2)))).toMap
    assert(r("k") == ((3L, 3L)))
    assert(r("j") == ((1L, 1L)))
  }

  test("reassignIds: contiguous per-partition ids in order") {
    val s = spark
    import s.implicits._
    val df = Seq(("a", 30), ("a", 10), ("a", 20), ("b", 5)).toDF("p", "v")
    val r = RelationalOps.reassignIds(df, Seq("p"), Seq(col("v")))
      .collect().map(x => (x.getString(0), x.getInt(1)) -> x.getInt(2)).toMap
    assert(r(("a", 10)) == 1 && r(("a", 20)) == 2 && r(("a", 30)) == 3 && r(("b", 5)) == 1)
  }

  test("unionHighestPriority: lowest priority number wins per key") {
    val s = spark
    import s.implicits._
    val b0 = Seq(("t", 1.0), ("u", 2.0)).toDF("k", "v")
    val b1 = Seq(("t", 9.0), ("w", 3.0)).toDF("k", "v")
    val r = RelationalOps.unionHighestPriority(Seq((b0, 0), (b1, 1)), Seq("k"))
      .collect().map(x => x.getString(0) -> x.getDouble(1)).toMap
    assert(r == Map("t" -> 1.0, "u" -> 2.0, "w" -> 3.0))
  }

  test("lexiconRoute: per-backend names translate, unmapped vars drop, priority wins") {
    val s = spark
    import s.implicits._
    // backend 0 speaks MARS shorthand and carries junk; backend 1 speaks CDS
    val b0 = Seq(("VAR_2T", 0L, 1.0), ("VAR_2T", 1L, 2.0), ("junk", 0L, 9.0))
      .toDF("variable", "k", "v")
    val b1 = Seq(("2t", 1L, 20.0), ("2t", 2L, 30.0), ("10u", 0L, 40.0))
      .toDF("variable", "k", "v")
    val r = RelationalOps.lexiconRoute(Seq(
      (b0, 0, Map("t2m" -> "VAR_2T")),
      (b1, 1, Map("t2m" -> "2t", "u10" -> "10u"))), "variable", Seq("k"))
      .collect().map(x => (x.getAs[String]("variable"), x.getAs[Long]("k")) ->
        x.getAs[Double]("v")).toMap
    // t2m: k=0,1 from backend 0 (wins), k=2 only in backend 1; u10 from 1;
    // junk never appears (no lexicon entry)
    assert(r == Map(("t2m", 0L) -> 1.0, ("t2m", 1L) -> 2.0,
      ("t2m", 2L) -> 30.0, ("u10", 0L) -> 40.0))
  }

  test("saltedJoin equals the plain join result") {
    val s = spark
    import s.implicits._
    // hot key "a" on the big side
    val big = ((1 to 50).map(i => ("a", i.toLong)) ++ Seq(("b", 100L), ("c", 200L)))
      .toDF("k", "uid")
    val small = Seq(("a", 1.0), ("b", 2.0), ("d", 4.0)).toDF("k", "w")
    val plain = big.join(small, "k").select("k", "uid", "w")
      .collect().map(_.toSeq).toSet
    val salted = RelationalOps.saltedJoin(big, small, "k", "uid", 4)
      .select("k", "uid", "w").collect().map(_.toSeq).toSet
    assert(salted == plain && salted.size == 51)
  }

  test("sessionize: gap threshold splits sessions per entity") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (1L, "2024-01-01 00:00:00"), (1L, "2024-01-01 00:10:00"),
      (1L, "2024-01-01 02:00:00"),                       // > 1h gap → new session
      (2L, "2024-01-01 05:00:00")
    ).toDF("user_id", "ts").withColumn("ts", to_timestamp(col("ts")))
    val r = RelationalOps.sessionize(df, "user_id", "ts", 3600L)
      .select("user_id", "ts", "session_id").collect()
      .map(x => (x.getLong(0), x.getTimestamp(1).toString.take(19)) -> x.getLong(2)).toMap
    assert(r((1L, "2024-01-01 00:00:00")) == 1L)
    assert(r((1L, "2024-01-01 00:10:00")) == 1L)
    assert(r((1L, "2024-01-01 02:00:00")) == 2L)
    assert(r((2L, "2024-01-01 05:00:00")) == 1L)
  }

  test("fieldStats: analytic moments for [1,2,3,4]") {
    val s = spark
    import s.implicits._
    val df = Seq(1.0, 2.0, 3.0, 4.0).map(("x", _)).toDF("field", "value")
    val r = StatsOps.fieldStats(df).collect()(0)
    assert(r.getAs[Long]("n") == 4)
    assert(r.getAs[Double]("mean") == 2.5)
    assert(r.getAs[Double]("var_pop") == 1.25)
    assert(r.getAs[Double]("min") == 1.0 && r.getAs[Double]("max") == 4.0)
    assert(r.getAs[Double]("median") == 2.5)
    assert(math.abs(r.getAs[Double]("skew")) < 1e-12)
  }

  test("nanInfCensus counts NaN / Inf / null separately") {
    val s = spark
    import s.implicits._
    val df = Seq[Option[Double]](Some(1.0), Some(Double.NaN),
      Some(Double.PositiveInfinity), None).toDF("x")
    val r = StatsOps.nanInfCensus(df, Seq("x")).collect()(0)
    assert(r.getAs[Long]("n_nan_x") == 1)
    assert(r.getAs[Long]("n_inf_x") == 1)
    assert(r.getAs[Long]("n_null_x") == 1)
  }

  test("vonMises: hydrostatic stress → 0; uniaxial → |s|; pure shear → sqrt(3)|t|") {
    val s = spark
    import s.implicits._
    val df = Seq(
      ("hydro", 5.0, 5.0, 5.0, 0.0, 0.0, 0.0),
      ("uni", 7.0, 0.0, 0.0, 0.0, 0.0, 0.0),
      ("shear", 0.0, 0.0, 0.0, 2.0, 0.0, 0.0)
    ).toDF("case", "sxx", "syy", "szz", "sxy", "syz", "szx")
    val r = df.select(col("case"), Physics.vonMises(col("sxx"), col("syy"),
      col("szz"), col("sxy"), col("syz"), col("szx")).as("vm"))
      .collect().map(x => x.getString(0) -> x.getDouble(1)).toMap
    assert(r("hydro") == 0.0)
    assert(r("uni") == 7.0)
    assert(math.abs(r("shear") - 2.0 * math.sqrt(3)) < 1e-12)
  }

  test("typed Dataset models round-trip the driver tables") {
    val dir = "/root/testdata/sf0.001"
    val docs = graft.model.Model.documents(spark, dir)
    val d = docs.head()
    assert(d.text.nonEmpty && d.n_chars == d.text.length)
    val emb = graft.model.Model.embeddings(spark, dir).head()
    assert(emb.embedding.length == 64)
    val ev = graft.model.Model.events(spark, dir).head()
    assert(ev.ts != null && ev.event_type.nonEmpty)
  }

  test("redact scrubs emails, urls, digit runs") {
    val s = spark
    import s.implicits._
    val df = Seq("mail bob@example.com then http://x.io/page and id 12345678 end")
      .toDF("text")
    val r = df.select(graft.operators.CurationOps.redact(col("text"))).collect()(0).getString(0)
    assert(r == "mail <EMAIL> then <URL> and id <NUM> end")
  }

  test("tokenBudgetSelect: greedy prefix per group under budget") {
    val s = spark
    import s.implicits._
    val df = Seq(
      ("en", 1L, 40L), ("en", 2L, 50L), ("en", 3L, 20L),  // cum: 40, 90, 110
      ("de", 4L, 100L), ("de", 5L, 1L)                      // cum: 100, 101
    ).toDF("lang", "doc_id", "n_tokens")
    val kept = graft.operators.CurationOps
      .tokenBudgetSelect(df, "lang", "doc_id", "n_tokens", 100L)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 2L, 4L))
  }

  test("qualityGate filters on thresholds; stratifiedSample is seed-deterministic") {
    val s = spark
    import s.implicits._
    val feats = Seq(
      (1L, 100L, 0.2, 0.01), (2L, 5L, 0.2, 0.01), (3L, 100L, 0.0, 0.5)
    ).toDF("doc_id", "n_tokens", "stop_ratio", "digit_ratio")
    val kept = graft.operators.CurationOps.qualityGate(feats, 10L, 0.1, 0.2)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L))

    val docs = (1 to 200).map(i => (i.toLong, if (i % 2 == 0) "en" else "de"))
      .toDF("doc_id", "lang")
    val a = graft.operators.CurationOps
      .stratifiedSample(docs, "lang", Map("en" -> 0.5, "de" -> 0.1), 42L)
      .collect().map(_.getLong(0)).toSet
    val b = graft.operators.CurationOps
      .stratifiedSample(docs, "lang", Map("en" -> 0.5, "de" -> 0.1), 42L)
      .collect().map(_.getLong(0)).toSet
    assert(a == b && a.nonEmpty)
  }

  test("languageId picks the dominant stopword language") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (1L, "the cat and the dog of the house"),
      (2L, "der hund ist nicht der beste und"),
      (3L, "xyz qrs tuv")
    ).toDF("doc_id", "text")
    val r = TextOps.languageId(df, "doc_id", "text").collect()
      .map(x => x.getLong(0) -> x.getString(x.length - 1)).toMap
    assert(r(1L) == "en" && r(2L) == "de" && r(3L) == "und")
  }

  test("gopherRules: analytic rule metrics and combined verdict") {
    val s = spark
    import s.implicits._
    val good = Seq.fill(3)(
      "the quick brown fox and that hound have with jumped over lazy dogs")
      .mkString(" ")
    val bullets = "- one\n- two\n- three\n* four"
    val symbols = "hash # tag # stuff # more # and # the..."
    val d = Seq((1L, good), (2L, bullets), (3L, symbols))
      .toDF("doc_id", "text")
    val r = TextOps.gopherRules(d, "doc_id", "text", minWords = 5)
      .collect().map(x => x.getLong(0) -> x).toMap
    assert(r(1L).getAs[Boolean]("passes"))
    assert(r(1L).getAs[Long]("n_words") == 39)
    assert(r(1L).getAs[Long]("n_stop_hits") == 15) // 5 stops × 3 repeats
    // every line bullet-started → rule 4 fails
    assert(r(2L).getAs[Double]("bullet_line_frac") == 1.0)
    assert(!r(2L).getAs[Boolean]("passes"))
    // 5 hashes + 1 ellipsis over 11 words → symbol rule fails
    assert(r(3L).getAs[Long]("n_symbols") == 6)
    assert(!r(3L).getAs[Boolean]("passes"))
  }

  test("qualityFeatures: analytic features for a known doc") {
    val s = spark
    import s.implicits._
    val df = Seq((1L, "the fox runs 42")).toDF("doc_id", "text")
    val r = TextOps.qualityFeatures(df, "doc_id", "text").collect()(0)
    assert(r.getAs[Int]("n_chars") == 15)
    assert(r.getAs[Int]("n_tokens") == 4)
    assert(r.getAs[Int]("n_stopwords") == 1)   // "the"
    assert(r.getAs[Double]("digit_ratio") == 2.0 / 15)
    assert(r.getAs[Double]("avg_token_len") == 3.0)  // (15-4+1)/4
  }

  test("qualityReport: one pass, mixed verdicts, golden fractions") {
    val s = spark
    import s.implicits._
    import graft.operators.StatsOps
    val df = Seq(
      (1L, Some("a"), 5.0), (2L, Some("b"), 50.0),
      (3L, None, 500.0), (4L, Some("b"), 5.0)).toDF("id", "t", "x")
    val got = StatsOps.qualityReport(df, Seq(
      StatsOps.NotNull("t", threshold = 0.8),
      StatsOps.Unique("t", threshold = 0.9),
      StatsOps.InRange("x", 0, 100, threshold = 0.7),
      StatsOps.MatchesRegex("t", "^[ab]$")))
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getAs[Double]("metric"), r.getAs[Boolean]("passed"))).toMap
    assert(got(("not_null", "t")) === (0.75, false))
    assert(got(("unique", "t")) === (0.5, false)) // 2 distinct non-null of 4
    assert(got(("in_range", "x")) === (0.75, true))
    assert(got(("matches_regex", "t")) === (0.75, false)) // null fails the regex
  }

  test("zValue interleaves bits; sorting by it confines 2-D boxes") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.functions._
    // golden: x=3 (11), y=5 (101) at 3 bits -> z = 1·1 + 1·4 + 1·2 + 1·32 = 39
    val z = Seq((3L, 5L)).toDF("x", "y")
      .select(graft.operators.CurationOps.zValue(col("x"), col("y"), 3).as("z"))
      .collect().head.getLong(0)
    assert(z === 39L)
    // every bucket of the stats report is a bounded rectangle
    val grid = (0L until 64L).flatMap(x => (0L until 64L).map(y => (x, y)))
      .toDF("x", "y")
    val stats = graft.operators.CurationOps
      .zOrderStats(grid, "x", "y", bits = 6, bucketShift = 6)
      .collect()
    stats.foreach { r =>
      assert(r.getAs[Long]("max_x") - r.getAs[Long]("min_x") <= 7)
      assert(r.getAs[Long]("max_y") - r.getAs[Long]("min_y") <= 7)
    }
    assert(stats.map(_.getAs[Long]("n")).sum === 4096L)
  }

  test("scd2 collapses runs into validity intervals") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.functions._
    val df = Seq(
      (1L, 10L, 1L, "a"), (1L, 20L, 2L, "a"), (1L, 30L, 3L, "b"),
      (1L, 40L, 4L, "a"), (2L, 15L, 5L, "x"))
      .toDF("k", "sec", "seq", "attr")
      .withColumn("ts", timestamp_seconds(col("sec")))
    val got = graft.operators.RelationalOps.scd2(df, "k", "ts", "seq", "attr")
      .select(col("k"), col("attr"),
        unix_seconds(col("valid_from")).as("f"),
        unix_seconds(col("valid_to")).as("t"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        Option(r.get(3)))).toSet
    assert(got === Set(
      (1L, "a", 10L, Some(30L)), (1L, "b", 30L, Some(40L)),
      (1L, "a", 40L, None), (2L, "x", 15L, None)))
  }

  test("funnel: strictly ordered firsts, depth census") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.functions._
    val df = Seq(
      (1L, 10L, "s"), (1L, 20L, "c"), (1L, 30L, "p"), // full funnel
      (2L, 10L, "c"), (2L, 20L, "s"), (2L, 30L, "c"), // s then later c: depth 2
      (3L, 10L, "p"), (3L, 20L, "s"),                 // p BEFORE s: depth 1
      (4L, 10L, "c"))                                  // never signed up: 0
      .toDF("k", "sec", "t")
      .withColumn("ts", timestamp_seconds(col("sec")))
    val got = graft.operators.RelationalOps.funnel(df, "k", "ts", "t",
      Seq("s", "c", "p"))
      .select("k", "reached")
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got === Map(1L -> 3, 2L -> 2, 3L -> 1, 4L -> 0))
  }

  test("cohortRetention counts distinct actives per day offset") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.functions._
    val day = 86400L
    val df = Seq(
      (1L, 0L), (1L, day), (1L, 2 * day),
      (2L, 0L), (2L, 2 * day),
      (3L, day), (3L, 2 * day))
      .toDF("k", "sec")
      .withColumn("ts", timestamp_seconds(col("sec")))
    val got = graft.operators.RelationalOps.cohortRetention(df, "k", "ts")
      .collect().map(r => (r.getDate(0).toString, r.getInt(1), r.getLong(2)))
      .toSet
    assert(got === Set(
      ("1970-01-01", 0, 2L), ("1970-01-01", 1, 1L), ("1970-01-01", 2, 2L),
      ("1970-01-02", 0, 1L), ("1970-01-02", 1, 1L)))
  }

  test("triangleCounts: degree-ordered orientation finds each triangle once") {
    val s = spark
    import s.implicits._
    // K4 on {1,2,3,4} (every node in 3 triangles) plus a pendant 5
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L), (4L, 5L), (2L, 1L) /* dup reversed */).toDF("src", "dst")
    val got = graft.graph.GraphOps.triangleCounts(edges, "src", "dst")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
  }

  test("TopKAgg equals the window form under any partitioning") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val rnd = new scala.util.Random(7)
    val rows = (1L to 500L).map(i =>
      (s"g${i % 7}", i, rnd.nextInt(40).toDouble)) // many score ties
    val df = rows.toDF("grp", "id", "score")
    val w = Window.partitionBy("grp").orderBy(col("score").desc, col("id").asc)
    val want = df.withColumn("rank", row_number().over(w))
      .where(col("rank") <= 3)
      .select("grp", "rank", "id", "score")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2))).toSet
    for (parts <- Seq(1, 3, 13)) {
      val got = graft.functions.TopK.topKPerGroup(
        df.repartition(parts), "grp", "id", "score", 3)
        .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2))).toSet
      assert(got === want, s"at $parts partitions")
    }
  }

  test("TopKAgg merge is order-insensitive at the k boundary") {
    val agg = new graft.functions.TopKAgg(2)
    val items = Seq((5.0, 1L), (5.0, 2L), (5.0, 3L), (7.0, 9L))
    val perms = items.permutations.take(12).toSeq
    val results = perms.map(p =>
      p.foldLeft(agg.zero)(agg.reduce))
    assert(results.distinct.size === 1)
    assert(results.head === Seq((7.0, 9L), (5.0, 1L)))
    // merging split halves gives the same answer
    val (l, r) = items.splitAt(2)
    assert(agg.merge(l.foldLeft(agg.zero)(agg.reduce),
      r.foldLeft(agg.zero)(agg.reduce)) === results.head)
  }

  test("assignSplits: exhaustive, exclusive, stable under reshuffling") {
    val s = spark
    import s.implicits._
    val df = (1L to 2000L).map(i => (i, s"doc$i")).toDF("id", "text")
    val splits = Seq("train" -> 0.9, "val" -> 0.05, "test" -> 0.05)
    val got = graft.operators.CurationOps.assignSplits(df, "id", splits)
      .groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // every row in exactly one split; proportions near weights
    assert(got.values.sum === 2000L)
    assert(got("train") > 1700 && got("val") > 50 && got("test") > 50)
    // stability: repartitioned input gives the identical assignment
    val again = graft.operators.CurationOps
      .assignSplits(df.repartition(7), "id", splits)
      .select("id", "split").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val base = graft.operators.CurationOps.assignSplits(df, "id", splits)
      .select("id", "split").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(again === base)
    intercept[IllegalArgumentException](
      graft.operators.CurationOps.assignSplits(df, "id", Seq("a" -> 0.5)))
  }

  test("corpusDiff classifies added/removed/changed/unchanged") {
    val s = spark
    import s.implicits._
    val a = Seq((1L, "same"), (2L, "old"), (3L, "gone")).toDF("doc_id", "text")
    val b = Seq((1L, "same"), (2L, "new"), (4L, "fresh")).toDF("doc_id", "text")
    val got = graft.operators.CurationOps.corpusDiff(a, b, "doc_id", "text")
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("status"))
      .toMap
    assert(got === Map(1L -> "unchanged", 2L -> "changed",
      3L -> "removed", 4L -> "added"))
  }

  test("ksTest: analytic D on a tiny two-sample fixture") {
    val s = spark
    import s.implicits._
    val df = Seq(("a", 1.0), ("a", 3.0), ("b", 2.0), ("b", 3.0), ("b", 4.0))
      .toDF("g", "v")
    val r = graft.operators.StatsOps.ksTest(df, "g", "v", "a", "b").collect()(0)
    // cums: v1 (1,0) num 3; v2 (1,1) num 1; v3 (2,2) num 2; v4 (2,3) num 0
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == ((2L, 3L, 3L)), r.toString)
    assert(r.getDouble(3) == 0.5 && r.getDouble(4) == 1.0, r.toString)
  }

  test("applyChangeSet: latest-wins, tombstones drop, untouched keys survive") {
    val s = spark
    import s.implicits._
    val base = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
      .toDF("k", "name", "v")
    val changes = Seq(
      (1L, "a", 11.0, 5L, "U"), (1L, "a", 12.0, 9L, "U"), // seq 9 wins
      (2L, "b", 0.0, 1L, "D"),                             // tombstone
      (4L, "d", 40.0, 2L, "U"))                            // insert
      .toDF("k", "name", "v", "_seq", "_op")
    val got = graft.operators.RelationalOps.applyChangeSet(
      base, changes, Seq("k"), "_seq", "_op")
      .collect().map(r => (r.getLong(0), r.getDouble(2))).toMap
    assert(got == Map(1L -> 12.0, 3L -> 30.0, 4L -> 40.0), got.toString)
  }

  test("chiSquare: analytic 2x2 incl. a zero-observed cell") {
    val s = spark
    import s.implicits._
    // counts: (a,0)=30, (a,1)=10, (b,0)=10, (b,1)=0; N=50
    val df = (Seq.fill(30)(("a", 0L)) ++ Seq.fill(10)(("a", 1L)) ++
      Seq.fill(10)(("b", 0L))).toDF("t", "b")
    val rows = graft.operators.StatsOps.chiSquare(df, "t", "b")
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(2), r.getDouble(3), r.getDouble(4)))).toMap
    // marginals: ra=40,10; rb=40,10 → e(a,0)=32, e(a,1)=8, e(b,0)=8, e(b,1)=2
    assert(rows(("b", 1L))._1 == 0L && rows(("b", 1L))._2 == 2.0)
    assert(rows(("a", 0L))._2 == 32.0 && rows(("a", 1L))._2 == 8.0)
    // chi2 = 4/32 + 4/8 + 4/8 + 4/2 = 3.125 on every row
    val chi2 = graft.operators.StatsOps.chiSquare(df, "t", "b")
      .select("chi2", "dof").distinct().collect()
    assert(chi2.length == 1 && chi2(0).getDouble(0) == 3.125 &&
      chi2(0).getLong(1) == 1L, chi2.mkString)
  }

  test("pointInPolygonJoin: concave notch, triangle slopes, outside census") {
    val s = spark
    import s.implicits._
    // L-shape: unit square minus the top-right quadrant (scaled by 100)
    val polys = Seq(
      (1L, Seq(0L, 200L, 200L, 100L, 100L, 0L, 0L),
        Seq(0L, 0L, 100L, 100L, 200L, 200L, 0L)),
      (2L, Seq(300L, 500L, 400L, 300L), Seq(0L, 0L, 170L, 0L)))
      .toDF("poly_id", "xs", "ys")
    val pts = Seq(
      (10L, 50L, 50L),    // deep inside the L
      (11L, 150L, 50L),   // inside the L's lower arm
      (12L, 150L, 150L),  // in the NOTCH → outside
      (13L, 50L, 150L),   // inside the L's upper arm
      (14L, 250L, 50L),   // outside both
      (15L, 400L, 50L),   // inside the triangle
      (16L, 490L, 160L),  // within the triangle's bbox but outside its slope
      (17L, 400L, 100L))  // inside the triangle
      .toDF("id", "x", "y")
    val got = graft.operators.RelationalOps.pointInPolygonJoin(
      pts, "id", "x", "y", polys, "poly_id", "xs", "ys", cellSize = 64L)
      .select("pid", "poly_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((10L, 1L), (11L, 1L), (13L, 1L), (15L, 2L), (17L, 2L)),
      got.toString)
  }

  test("skyline: strict dominance, duplicates survive, partition invariant") {
    val s = spark
    import s.implicits._
    // maximize x, minimize y
    val pts = Seq((1L, 5.0, 10.0), (2L, 5.0, 10.0), // duplicates both live
      (3L, 6.0, 10.0),  // dominates 1,2 (x strictly better, y equal)
      (4L, 4.0, 3.0),   // frontier (best y)
      (5L, 6.0, 12.0),  // dominated by 3
      (6L, 9.0, 20.0))  // frontier (best x)
      .toDF("id", "x", "y").repartition(7)
    val got = graft.operators.RelationalOps.skyline(pts,
      Seq(("x", true), ("y", false)))
      .select("id").collect().map(_.getLong(0)).toSet
    assert(got == Set(3L, 4L, 6L), got.toString)
    val dup = Seq((1L, 5.0, 10.0), (2L, 5.0, 10.0)).toDF("id", "x", "y")
      .repartition(3)
    val got2 = graft.operators.RelationalOps.skyline(dup,
      Seq(("x", true), ("y", false)))
      .select("id").collect().map(_.getLong(0)).toSet
    assert(got2 == Set(1L, 2L), "equal points never dominate each other")
  }

  test("madOutliers: analytic medians and outlier census") {
    val s = spark
    import s.implicits._
    // group g: values 1..9 plus 100 → med = 5.5, |x-med| = 4.5,3.5,...,94.5
    // sorted ads: .5,.5,1.5,1.5,2.5,2.5,3.5,3.5,4.5,94.5 → mad = 2.5
    // outliers: ad > 7.5 → only 100 (ad 94.5) and 1 (4.5? no) → 1 outlier
    val df = ((1 to 9).map(v => ("g", v.toDouble)) :+ (("g", 100.0)))
      .toDF("g", "v")
    val r = graft.operators.StatsOps.madOutliers(df, "g", "v", 3.0).collect()(0)
    assert(r.getLong(1) == 10L)
    assert(r.getDouble(2) == 5.5 && r.getDouble(3) == 2.5, r.toString)
    assert(r.getLong(4) == 1L, r.toString)
  }

  test("resample: ffill + linear interp on an analytic series") {
    val s = spark
    import s.implicits._
    // key a: obs at 10→1.0, 30→5.0, 45→2.0; ticks (step 10): 10..40
    val df = Seq(("a", 10L, 1.0), ("a", 30L, 5.0), ("a", 45L, 2.0),
      ("b", 7L, 9.0)).toDF("k", "ts", "v")
    val got = graft.operators.RelationalOps.resample(df, "k", "ts", "v", 10L)
      .collect().map(r => (r.getString(0), r.getLong(1),
        r.getDouble(2), r.getDouble(3))).toSet
    // b's only tick (0) precedes its first obs (7) → no b rows at all
    assert(got == Set(
      ("a", 10L, 1.0, 1.0),            // exact obs hit
      ("a", 20L, 1.0, 3.0),            // halfway 1→5
      ("a", 30L, 5.0, 5.0),            // exact obs hit
      ("a", 40L, 5.0, 5.0 + (2.0 - 5.0) * 10 / 15))) // between 30 and 45
  }

  test("radiusJoin: exact pair set incl. negative coords, boundary, cross-cell") {
    val s = spark
    import s.implicits._
    // pairs at exactly r, just under, just over, crossing cell borders,
    // and in the negative quadrant (floor-division cells, not truncation)
    val pts = Seq(
      (1L, 0L, 0L), (2L, 5L, 0L),    // dist2 = 25 = r² → in
      (3L, 9L, 0L),                   // to 2: 16 → in; to 1: 81 → out
      (4L, 0L, 6L),                   // to 1: 36 → out
      (5L, -1L, -1L), (6L, -4L, -4L), // negative quadrant: dist2 = 18 → in
      (7L, 100L, 100L)                // isolated
    ).toDF("id", "x", "y")
    val got = graft.operators.RelationalOps.radiusJoin(pts, "id", "x", "y", 5L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == Set((1L, 2L, 25L), (2L, 3L, 16L), (5L, 6L, 18L),
      (1L, 5L, 2L)))
  }

  test("luhnScan: checksum gates candidates, separators, odd length, no-hit docs") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (1L, "pay with 4539 5787 6362 1486 today"),   // valid, spaced
      (2L, "ref 4539-5787-6362-1487 thanks"),       // off-by-one: invalid
      (3L, "amex 378282246310005 works"),           // valid, 15 digits (odd parity)
      (4L, "only words, and 12345 is short"),       // no candidate at all
      (5L, "two: 6011111111111117 and 1234567890123456") // one valid, one not
    ).toDF("doc_id", "text")
    val got = graft.operators.TextOps.luhnScan(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), Option(r.getString(3))))).toMap
    assert(got(1L) == ((1L, 1L, Some("1486"))))
    assert(got(2L) == ((1L, 0L, None)))
    assert(got(3L) == ((1L, 1L, Some("0005"))))
    assert(got(4L) == ((0L, 0L, None)))
    assert(got(5L) == ((2L, 1L, Some("1117"))))
  }

  test("zipfSlope: exact power law fits slope -1 with R²=1; topN truncates") {
    val s = spark
    import s.implicits._
    // counts 12/6/4/3 = 12·rank⁻¹ exactly for ranks 1..4 — a perfect
    // Zipf line, so the closed-form OLS must recover s=-1, c=ln 12, R²=1
    val text = (Seq.fill(12)("a") ++ Seq.fill(6)("b") ++
      Seq.fill(4)("c") ++ Seq.fill(3)("d")).mkString(" ")
    val df = Seq((1L, text)).toDF("doc_id", "text")
    val r = graft.operators.TextOps.zipfSlope(df, "text", topN = 100)
      .collect()(0)
    assert(r.getLong(0) == 4L)
    assert(math.abs(r.getDouble(1) - (-1.0)) < 1e-9)
    assert(math.abs(r.getDouble(2) - math.log(12.0)) < 1e-9)
    assert(math.abs(r.getDouble(3) - 1.0) < 1e-9)
    // topN keeps only the heaviest ranks (here the first two points)
    val t = graft.operators.TextOps.zipfSlope(df, "text", topN = 2)
      .collect()(0)
    assert(t.getLong(0) == 2L)
    assert(math.abs(t.getDouble(1) - (-1.0)) < 1e-9)
  }

  test("dpNoisyCounts: seeded Laplace noise replayed analytically; ε guard") {
    val s = spark
    import s.implicits._
    val df = (Seq.fill(7)("a") ++ Seq.fill(3)("b")).toDF("g")
    val got = graft.operators.CurationOps.dpNoisyCounts(df, "g",
      epsilon = 0.5, seed = 42L)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    def noise(key: String): Double = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$key#42".getBytes("UTF-8"))
      val hex = md.map("%02x".format(_)).mkString.take(15)
      val u = java.lang.Long.parseLong(hex, 16).toDouble / math.pow(2, 60)
      val c = u - 0.5
      -2.0 * math.signum(c) * math.log(math.max(1e-12, 1.0 - 2.0 * math.abs(c)))
    }
    assert(got("a")._1 == 7L && got("b")._1 == 3L)
    assert(math.abs(got("a")._2 - (7.0 + noise("a"))) < 1e-9)
    assert(math.abs(got("b")._2 - (3.0 + noise("b"))) < 1e-9)
    // noise is key-deterministic but differs across keys (w.h.p. fixture)
    assert(got("a")._2 - 7.0 != got("b")._2 - 3.0)
    intercept[IllegalArgumentException] {
      graft.operators.CurationOps.dpNoisyCounts(df, "g", epsilon = 0.0, seed = 1L)
    }
  }

  test("leakageSafeSplits: cluster members share a split by construction") {
    val s = spark
    import s.implicits._
    val docs = (1L to 6L).toDF("doc_id")
    // chain 1-2-3 is one cluster; 4 and 5 pair; 6 is a singleton
    val pairs = Seq((1L, 2L), (2L, 3L), (4L, 5L)).toDF("da", "db")
    val got = graft.operators.CurationOps.leakageSafeSplits(docs, "doc_id",
      pairs, Seq("train" -> 0.9, "val" -> 0.05, "test" -> 0.05))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2)))).toMap
    assert(Set(1L, 2L, 3L).map(got(_)._1) == Set(1L), "min-label component")
    assert(Set(1L, 2L, 3L).map(got(_)._2).size == 1, "cluster shares one split")
    assert(got(4L) == got(5L))
    assert(got(6L)._1 == 6L)
    // split depends only on the component: docs 2,3 inherit doc 1's hash
    assert(got(2L)._2 == got(1L)._2 && got(3L)._2 == got(1L)._2)
  }

  test("classifierReport: analytic confusion metrics, absent-class conventions") {
    val s = spark
    import s.implicits._
    // truth: 3×a, 2×b, 1×c; pred: a→a,a,b; b→a,b; c→d (c never predicted,
    // d never true)
    val df = Seq(("a", "a"), ("a", "a"), ("a", "b"), ("b", "a"), ("b", "b"),
      ("c", "d")).toDF("truth", "pred")
    val got = graft.operators.StatsOps.classifierReport(df, "truth", "pred")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4),
          r.getDouble(5), r.getDouble(6)))).toMap
    // a: tp=2, n_true=3, n_pred=3 → P=2/3, R=2/3, F1=2/3
    assert(got("a") == ((3L, 3L, 2L, 2.0 / 3, 2.0 / 3, 2.0 / 3)))
    // b: tp=1, n_true=2, n_pred=2 → 1/2 everywhere
    assert(got("b") == ((2L, 2L, 1L, 0.5, 0.5, 0.5)))
    // c: true but never predicted → P=0 (zero denom convention), R=0, F1=0
    assert(got("c") == ((1L, 0L, 0L, 0.0, 0.0, 0.0)))
    // d: predicted but never true → all zero by the same conventions
    assert(got("d") == ((0L, 1L, 0L, 0.0, 0.0, 0.0)))
  }

  test("blocklistScan: boundaries, repeats, case fold, clean docs, term guard") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (1L, "spam and SPAM again"),      // case-folded repeat: 2 hits, 1 term
      (2L, "spammer antispam spams"),   // substrings only: word boundary holds
      (3L, "ham with spam and junk"),   // two distinct terms
      (4L, "perfectly clean prose"),
      (5L, "junk junk junk")            // over the maxHits=2 gate
    ).toDF("doc_id", "text")
    val got = graft.operators.TextOps
      .blocklistScan(docs, "doc_id", "text", Seq("spam", "junk"), maxHits = 2)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getBoolean(3)))).toMap
    assert(got(1L) == ((2L, 1L, true)))
    assert(got(2L) == ((0L, 0L, true)))
    assert(got(3L) == ((2L, 2L, true)))
    assert(got(4L) == ((0L, 0L, true)))
    assert(got(5L) == ((3L, 1L, false)))
    intercept[IllegalArgumentException] {
      graft.operators.TextOps.blocklistScan(docs, "doc_id", "text",
        Seq("bad|term"), maxHits = 0)
    }
  }
}
