package graft

import org.apache.spark.sql.execution.ExplainMode

/** Physical-plan regression pins — the 100 TB properties PLANS.md narrates,
  * asserted on the actual plans so a regression fails CI instead of only
  * drifting the prose: scan pushdown, broadcast dims, partial+final
  * aggregation, candidate-driven (never cartesian) dedup joins, and the
  * two-pass prefix sum.
  */
class PlanSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def formatted(name: String): String = {
    val df = SparkEntry.queries(name)(spark, dir)
    df.queryExecution.explainString(ExplainMode.fromString("formatted"))
  }

  test("q_field_select_pushdown: predicates AND pruned columns reach the parquet scan") {
    val p = formatted("q_field_select_pushdown")
    assert(p.contains("PushedFilters"), "no filter pushdown section in the scan")
    assert(p.contains("l_shipdate") && p.contains("GreaterThan"),
      "expected shipdate/discount predicates in PushedFilters")
    // projection pruning: the scan must NOT read the wide remainder of lineitem
    assert(!p.contains("l_comment") && !p.contains("l_partkey"),
      "scan reads columns the query never uses")
  }

  test("q_era5_routing: variable selection pushes into both NetCDF relation scans") {
    val p = formatted("q_era5_routing")
    // each backend's scan advertises exactly its lexicon's variables —
    // the junk variable is decoded only because backend 0's frame keeps it
    // to prove the lexicon-level drop; backend 1 reads only 2t/10u
    assert(p.contains("vars=[VAR_2T,junk]"),
      s"backend-0 variable pushdown missing:\n$p")
    assert(p.contains("vars=[10u,2t]"),
      s"backend-1 variable pushdown missing:\n$p")
    assert(!p.contains("CartesianProduct"))
  }

  test("q_vti_roundtrip: each unioned field branch prunes the VTI scan to its column") {
    val p = formatted("q_vti_roundtrip")
    // every branch's DSv2 scan reads (i, j, <field>) only — grid_id, k and
    // the xyz coordinate columns never reach the reader
    val scans = "graft_vti ReadSchema: ([^\\n]*)".r.findAllMatchIn(p).map(_.group(1)).toSeq
    assert(scans.nonEmpty, s"no VTI DSv2 scan in plan:\n$p")
    scans.foreach { s =>
      assert(!s.contains("x") && !s.contains("grid_id"),
        s"VTI scan not pruned: $s")
    }
  }

  test("q_join_regional_revenue: bounded dims broadcast, agg is partial+final") {
    val p = formatted("q_join_regional_revenue")
    assert(p.contains("BroadcastHashJoin"), "bounded dims must broadcast")
    assert("HashAggregate".r.findAllIn(p).size >= 2,
      "aggregation must split partial+final")
    assert(!p.contains("CartesianProduct"))
  }

  test("dedup/similarity candidate joins never degrade to cartesian products") {
    Seq("q_exact_dedup", "q_jaccard_pairs", "q_lsh_band_pairs", "q_simhash_pairs",
      "q_salted_join", "q_sessionize", "q_token_budget", "q_topk_cosine",
      "q_dup_spans", "q_unigram_lm", "q_gopher_rules", "q_passage_dedup",
      "q_tfidf", "q_bigram_lm", "q_token_entropy", "q_weighted_sample",
      "q_chunk_tokens", "q_pack_sequences", "q_zscore_gate",
      "q_bpe_encode", "q_mp4_meta", "q_profile_approx", "q_approx_distinct")
      .foreach { q =>
        val p = formatted(q)
        assert(!p.contains("CartesianProduct"), s"$q plans a CartesianProduct")
        // legitimate bounded nested-loops: brute top-k over its bounded
        // query set, the salt-range replication of the SMALL join side
        // (that replication IS the salting technique), and the 1-row
        // corpus-total broadcasts of the unigram LM and TF-IDF
        // (the scalar-inject pattern)
        val scalarInject = Set("q_topk_cosine", "q_salted_join",
          "q_unigram_lm", "q_tfidf")
        if (!scalarInject(q))
          assert(!p.contains("BroadcastNestedLoopJoin"), s"$q plans a nested-loop join")
      }
  }

  test("round-10 operators: no cartesian; bounded broadcasts only where intended") {
    // q_nb_classify: the (V×L) model and the L-row label table ride
    // broadcasts; the only nested loop is the bounded label-set inject.
    // q_hamming_topk: the bounded query-bit set broadcasts (the
    // q_topk_cosine pattern). Scans stay cartesian-free everywhere.
    Seq("q_nb_classify", "q_hamming_topk", "q_luhn_cards", "q_blocklist",
      "q_zipf_slope", "q_hard_negatives", "q_classifier_eval",
      "q_phash_pairs", "q_audio_fp_pairs").foreach { q =>
      val p = formatted(q)
      assert(!p.contains("CartesianProduct"), s"$q plans a CartesianProduct")
    }
    // q_regrid's ONLY non-equi join must be the bounded target-lattice
    // generator (fields × dst cells) — the corner join itself is equi
    val rg = formatted("q_regrid")
    assert(rg.contains("BroadcastHashJoin") || rg.contains("SortMergeJoin"),
      "regrid corner join must be an equi-join")
    val nb = formatted("q_nb_classify")
    assert(nb.contains("BroadcastHashJoin"),
      "NB model join must broadcast the code table")
    // zipf: the top-N census cut is the bounded TakeOrdered form, never
    // a full vocabulary sort
    val zipf = formatted("q_zipf_slope")
    assert(zipf.contains("TakeOrderedAndProject"),
      s"zipf top-N must plan TakeOrderedAndProject:\n$zipf")
  }

  test("semanticDedup: pair join buckets on the cluster id, no cartesian") {
    val s = spark
    import s.implicits._
    val df = (0 until 40).map(i =>
      (i.toLong, Array.tabulate(8)(d => (i * 7 + d).toFloat / 10)))
      .toDF("vec_id", "embedding")
    val cents = Seq(Array.fill(8)(1.0f), Array.tabulate(8)(d => -1.0f + d * 0.1f))
    val plan = graft.operators.SimilarityOps
      .semanticDedup(df, "vec_id", "embedding", tau = 0.99, cents)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), "semanticDedup plans a CartesianProduct")
    spark.catalog.clearCache()
  }

  test("q_atom_offsets: prefix sum is the two-pass form, not one global window task") {
    val p = formatted("q_atom_offsets")
    // a bare Window.orderBy (no partitionBy) would plan a single-partition
    // Sort+Window over ALL rows; the two-pass form windows within the
    // range partitions instead
    assert(!p.contains("Window [") || p.contains("_pid"),
      "global window without partition-local structure")
    assert(p.contains("rangepartitioning") || p.contains("REPARTITION"),
      "expected the range-partitioned first pass")
  }

  test("q_asof_join: union+window form — one key shuffle, no theta join") {
    val p = formatted("q_asof_join")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "as-of join degraded to an all-pairs theta join")
    assert(p.contains("Window"), "expected the running-last window form")
    // shuffles: the fixture's right-side (user, ts) dedup agg, the key
    // exchange for the window, the per-user aggregation, and the
    // oracle-determinism output sort — nothing else (the operator itself
    // contributes exactly ONE: the window's key exchange)
    assert("\\(\\d+\\) Exchange".r.findAllIn(p).size <= 4,
      "as-of join shuffles more than dedup + key + agg + sort")
  }

  test("q_range_join: bucket equi-join, never a nested-loop interval join") {
    val p = formatted("q_range_join")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "range join planned as all-pairs; the bucket key must make it an equi-join")
    assert(p.contains("HashJoin") || p.contains("SortMergeJoin"),
      "expected a hash/sort-merge equi-join on the bucket key")
  }

  test("SpatialJoinRewrite: naive distance theta join becomes a cell equi-join") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.functions._
    s.experimental.extraOptimizations =
      s.experimental.extraOptimizations :+ graft.plans.SpatialJoinRewrite
    try {
      val a = Seq((1L, 0L, 0L), (2L, 3L, 4L), (3L, 100L, 100L), (4L, -2L, -2L))
        .toDF("ida", "xa", "ya")
      val b = Seq((10L, 0L, 5L), (11L, 4L, 4L), (12L, 103L, 104L),
        (13L, -6L, -5L)).toDF("idb", "xb", "yb")
      val cond = (col("xa") - col("xb")) * (col("xa") - col("xb")) +
        (col("ya") - col("yb")) * (col("ya") - col("yb")) <= lit(25L)
      val j = a.join(b, cond)
      val p = j.queryExecution.executedPlan.toString
      assert(!p.contains("BroadcastNestedLoopJoin") &&
        !p.contains("CartesianProduct"),
        s"theta join not rewritten to the cell equi-join:\n$p")
      assert(p.contains("Generate"), "expected the 3x3 neighborhood fan-out")
      val got = j.select("ida", "idb").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      // brute-force truth
      val pa = Seq((1L, 0L, 0L), (2L, 3L, 4L), (3L, 100L, 100L), (4L, -2L, -2L))
      val pb = Seq((10L, 0L, 5L), (11L, 4L, 4L), (12L, 103L, 104L),
        (13L, -6L, -5L))
      val want = (for ((ia, xa, ya) <- pa; (ib, xb, yb) <- pb
        if (xa - xb) * (xa - xb) + (ya - yb) * (ya - yb) <= 25L)
        yield (ia, ib)).toSet
      assert(got == want, s"got $got want $want")
    } finally {
      s.experimental.extraOptimizations = s.experimental.extraOptimizations
        .filterNot(_ eq graft.plans.SpatialJoinRewrite)
    }
  }

  test("SpatialJoinRewrite: 1-D band theta join becomes a cell equi-join") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.functions._
    withSpatialRule {
      val a = Seq((1L, 0L), (2L, 7L), (3L, 100L), (4L, -9L)).toDF("ida", "va")
      val b = Seq((10L, 5L), (11L, 8L), (12L, 104L), (13L, -14L)).toDF("idb", "vb")
      val j = a.join(b, abs(col("va") - col("vb")) <= lit(5L))
      val p = j.queryExecution.executedPlan.toString
      assert(!p.contains("BroadcastNestedLoopJoin") &&
        !p.contains("CartesianProduct"),
        s"band join not rewritten to the cell equi-join:\n$p")
      assert(p.contains("Generate"), "expected the 3-offset fan-out")
      val got = j.select("ida", "idb").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val want = (for ((ia, va) <- Seq((1L, 0L), (2L, 7L), (3L, 100L), (4L, -9L));
                       (ib, vb) <- Seq((10L, 5L), (11L, 8L), (12L, 104L), (13L, -14L))
                       if math.abs(va - vb) <= 5L) yield (ia, ib)).toSet
      assert(got == want, s"got $got want $want")
      // r = 0 degenerates to equality and must stay correct
      val j0 = a.join(b, abs(col("va") - col("vb")) <= lit(0L))
      assert(j0.count() == 0)
      // IntegerType attributes must NOT fire (the int-wrap guard)
      val ai = Seq((1L, 0)).toDF("ida", "va")
      val bi = Seq((10L, 5)).toDF("idb", "vb")
      val pi = ai.join(bi, abs(col("va") - col("vb")) <= lit(5))
        .queryExecution.executedPlan.toString
      assert(pi.contains("BroadcastNestedLoopJoin") ||
        pi.contains("CartesianProduct"),
        s"int-typed band join should stay a theta join:\n$pi")
      // the BETWEEN spelling fires too and returns the same pairs
      val jb = a.join(b,
        col("va") >= col("vb") - lit(5L) && col("va") <= col("vb") + lit(5L))
      val pb = jb.queryExecution.executedPlan.toString
      assert(!pb.contains("BroadcastNestedLoopJoin") &&
        !pb.contains("CartesianProduct"),
        s"BETWEEN band join not rewritten:\n$pb")
      val gotB = jb.select("ida", "idb").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(gotB == got, s"BETWEEN pairs $gotB != abs pairs $got")
      // mismatched radii must NOT fire (strict same-r match)
      val pm = a.join(b,
        col("va") >= col("vb") - lit(5L) && col("va") <= col("vb") + lit(6L))
        .queryExecution.executedPlan.toString
      assert(pm.contains("BroadcastNestedLoopJoin") ||
        pm.contains("CartesianProduct"),
        s"asymmetric bounds should stay a theta join:\n$pm")
    }
  }

  private def withSpatialRule[T](body: => T): T = {
    val s = spark
    s.experimental.extraOptimizations =
      s.experimental.extraOptimizations :+ graft.plans.SpatialJoinRewrite
    try body finally {
      s.experimental.extraOptimizations = s.experimental.extraOptimizations
        .filterNot(_ eq graft.plans.SpatialJoinRewrite)
    }
  }

  private val spatialA =
    Seq((1L, 0L, 0L), (2L, 3L, 4L), (3L, 100L, 100L), (4L, -2L, -2L))
  private val spatialB =
    Seq((10L, 0L, 5L), (11L, 4L, 4L), (12L, 103L, 104L), (13L, -6L, -5L))

  test("SpatialJoinRewrite: Manhattan theta join becomes a cell equi-join") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.functions._
    withSpatialRule {
      val a = spatialA.toDF("ida", "xa", "ya")
      val b = spatialB.toDF("idb", "xb", "yb")
      val cond = abs(col("xa") - col("xb")) + abs(col("ya") - col("yb")) <=
        lit(7L)
      val j = a.join(b, cond)
      val p = j.queryExecution.executedPlan.toString
      assert(!p.contains("BroadcastNestedLoopJoin") &&
        !p.contains("CartesianProduct"),
        s"Manhattan theta join not rewritten:\n$p")
      assert(p.contains("Generate"), "expected the 3x3 neighborhood fan-out")
      val got = j.select("ida", "idb").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val want = (for ((ia, xa, ya) <- spatialA; (ib, xb, yb) <- spatialB
        if math.abs(xa - xb) + math.abs(ya - yb) <= 7L)
        yield (ia, ib)).toSet
      assert(got == want, s"got $got want $want")
    }
  }

  test("SpatialJoinRewrite: Chebyshev theta join becomes a cell equi-join") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.functions._
    withSpatialRule {
      val a = spatialA.toDF("ida", "xa", "ya")
      val b = spatialB.toDF("idb", "xb", "yb")
      val cond = greatest(abs(col("xa") - col("xb")),
        abs(col("ya") - col("yb"))) <= lit(5L)
      val j = a.join(b, cond)
      val p = j.queryExecution.executedPlan.toString
      assert(!p.contains("BroadcastNestedLoopJoin") &&
        !p.contains("CartesianProduct"),
        s"Chebyshev theta join not rewritten:\n$p")
      val got = j.select("ida", "idb").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val want = (for ((ia, xa, ya) <- spatialA; (ib, xb, yb) <- spatialB
        if math.max(math.abs(xa - xb), math.abs(ya - yb)) <= 5L)
        yield (ia, ib)).toSet
      assert(got == want, s"got $got want $want")
    }
  }

  test("SpatialJoinRewrite: bbox containment join becomes a cell equi-join") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.functions._
    withSpatialRule {
      // small cell size so the box fan-out actually exercises sequence()
      s.conf.set("spark.graft.spatial.bboxCellSize", "8")
      try {
        val pts = Seq((1L, 3L, 4L), (2L, 50L, 50L), (3L, -10L, 2L),
          (4L, 17L, 90L)).toDF("pid", "px", "py")
        val boxes = Seq((100L, 0L, 10L, 0L, 10L), (101L, 40L, 60L, 45L, 55L),
          (102L, -20L, -1L, -5L, 5L), (103L, 15L, 20L, 80L, 95L))
          .toDF("bid", "xmin", "xmax", "ymin", "ymax")
        val cond = col("px") >= col("xmin") && col("px") <= col("xmax") &&
          col("py") >= col("ymin") && col("py") <= col("ymax")
        val j = pts.join(boxes, cond)
        val p = j.queryExecution.executedPlan.toString
        assert(!p.contains("BroadcastNestedLoopJoin") &&
          !p.contains("CartesianProduct"),
          s"bbox containment join not rewritten:\n$p")
        assert(p.contains("Generate"), "expected the bbox cell fan-out")
        val got = j.select("pid", "bid").collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
        assert(got == Set((1L, 100L), (2L, 101L), (3L, 102L), (4L, 103L)),
          s"got $got")
      } finally s.conf.unset("spark.graft.spatial.bboxCellSize")
    }
  }

  test("SpatialJoinRewrite: exact cells above 2^53 (no Double rounding loss)") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.functions._
    withSpatialRule {
      // Double-cast cell math rounds these to different multiples of 256
      // and would silently drop the qualifying pair
      val base = 1L << 60
      val a = Seq((1L, base + 129L, 0L), (2L, base - 500L, 7L))
        .toDF("ida", "xa", "ya")
      val b = Seq((10L, base + 127L, 1L), (11L, base + 1000L, 2L))
        .toDF("idb", "xb", "yb")
      val cond = abs(col("xa") - col("xb")) + abs(col("ya") - col("yb")) <=
        lit(3L)
      val got = a.join(b, cond).select("ida", "idb").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == Set((1L, 10L)), s"high-magnitude pair lost: $got")
    }
  }

  test("SpatialJoinRewrite: a degenerate box fails loudly at the cell cap") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.functions._
    withSpatialRule {
      s.conf.set("spark.graft.spatial.bboxCellSize", "1")
      s.conf.set("spark.graft.spatial.maxBoxCells", "1000")
      try {
        val pts = Seq((1L, 3L, 4L)).toDF("pid", "px", "py")
        val wide = Seq((100L, -100000L, 100000L, -100000L, 100000L))
          .toDF("bid", "xmin", "xmax", "ymin", "ymax")
        val cond = col("px") >= col("xmin") && col("px") <= col("xmax") &&
          col("py") >= col("ymin") && col("py") <= col("ymax")
        val e = intercept[Exception] {
          pts.join(wide, cond).count()
        }
        def messages(t: Throwable): Seq[String] =
          Option(t).toSeq.flatMap(x =>
            Option(x.getMessage).toSeq ++ messages(x.getCause))
        assert(messages(e).exists(_.contains("maxBoxCells")),
          s"expected the cell-cap error, got: $e")
        // same data under a cell size that keeps the cover small: works
        s.conf.set("spark.graft.spatial.bboxCellSize", "100000")
        val ok = pts.join(wide, cond).select("pid", "bid").collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
        assert(ok == Set((1L, 100L)))
      } finally {
        s.conf.unset("spark.graft.spatial.bboxCellSize")
        s.conf.unset("spark.graft.spatial.maxBoxCells")
      }
    }
  }

  test("SpatialJoinRewrite: does NOT fire on IntegerType coordinates " +
    "(int distance arithmetic can wrap, changing naive-plan semantics)") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.functions._
    withSpatialRule {
      val a = Seq((1, 0, 0), (2, 100000, 0)).toDF("ida", "xa", "ya")
      val b = Seq((10, 0, 1), (11, 2147400000, 0)).toDF("idb", "xb", "yb")
      val cond = (col("xa") - col("xb")) * (col("xa") - col("xb")) +
        (col("ya") - col("yb")) * (col("ya") - col("yb")) <= lit(25)
      val j = a.join(b, cond)
      val p = j.queryExecution.executedPlan.toString
      assert(p.contains("BroadcastNestedLoopJoin") ||
        p.contains("CartesianProduct"),
        s"rule fired on int coords where products can wrap:\n$p")
    }
  }

  test("q_resample: all window frames share ONE sort (no per-frame re-sort)") {
    val p = formatted("q_resample")
    val sorts = "\\(\\d+\\) Sort".r.findAllIn(p).size
    // one sort feeds the whole backward+forward window stack; the only
    // other sort is the output orderBy
    assert(sorts <= 2, s"expected <= 2 Sort nodes, found $sorts:\n$p")
    assert("\\(\\d+\\) Window".r.findAllIn(p).size >= 2,
      "expected the two-frame window stack")
  }

  test("q_tpch_q3: the filtered customer dim broadcasts; no cartesian") {
    val p = formatted("q_tpch_q3")
    assert(p.contains("BroadcastHashJoin"),
      "the BUILDING-filtered customer side should broadcast")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"))
  }

  test("q_orc_roundtrip: the quantity predicate reaches the ORC scan") {
    val p = formatted("q_orc_roundtrip")
    assert(p.contains("ORC") || p.toLowerCase.contains("orc"),
      "expected an ORC relation in the plan")
    assert(p.contains("PushedFilters") && p.contains("GreaterThan"),
      "quantity predicate must push into the ORC scan")
  }

  test("q_spatial_join: cell equi-join, never an all-pairs distance join") {
    val p = formatted("q_spatial_join")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "radius join planned as all-pairs; the cell key must make it an equi-join")
    assert(p.contains("HashJoin") || p.contains("SortMergeJoin"),
      "expected a hash/sort-merge equi-join on the (cx, cy) cell key")
  }

  test("q_bucketed_join: co-located buckets join with no join-side shuffle") {
    val p = formatted("q_bucketed_join") // building the query writes the tables
    assert(p.contains("SortMergeJoin"), "bucketed join must stay a merge join")
    // the ONLY exchanges allowed are the post-join aggregation and the
    // output sort: the join itself reads co-located buckets shuffle-free
    assert("\\(\\d+\\) Exchange".r.findAllIn(p).size <= 2,
      "bucketed join plans a shuffle the bucketing should have paid already")
    assert(p.contains("SelectedBucketsCount") || p.contains("Bucketed: true"),
      "scan does not report bucketed reading")
  }

  test("q_exact_dedup: one reduction shuffle, map-side partial aggregation") {
    val p = formatted("q_exact_dedup")
    assert("HashAggregate".r.findAllIn(p).size >= 2)
    // formatted output names each node once in the detail section as
    // "(n) Exchange"; the only shuffles allowed are the one aggregation
    // reduction plus the oracle-determinism orderBy
    assert("\\(\\d+\\) Exchange".r.findAllIn(p).size <= 2,
      "more shuffles than the one reduction + output sort need")
  }

  test("whole-stage codegen covers the text-derivation hot paths") {
    // AQE inserts WholeStageCodegen per-stage at EXECUTION — run the query,
    // then inspect the final adaptive plan
    val df = SparkEntry.queries("q_text_quality")(spark, dir)
    df.collect() // executes THIS queryExecution (count() would plan a new one)
    val p = df.queryExecution.executedPlan.toString
    // codegen'd stages render as "*(n) Project"-style star markers; the
    // feature projection must carry one
    assert("\\*\\(\\d+\\) Project".r.findFirstIn(p).nonEmpty,
      "text feature projection fell out of whole-stage codegen")
  }

  test("skewed keys: AQE skew-join split fires; saltedJoin gives identical results") {
    // The 100 TB skew story has two tiers: AQE's runtime skew-join split
    // (free, no code changes) and the explicit saltedJoin fallback (for
    // engines/joins AQE can't re-plan). Pin BOTH on one deliberately
    // skewed fixture: ~91% of the big side lands on key 0.
    val s = spark
    import org.apache.spark.sql.functions.{col, lit, when}
    val saved = Seq(
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.coalescePartitions.enabled",
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.shuffle.partitions")
      .map(k => k -> util.Try(s.conf.get(k)).toOption).toMap
    try {
      // the suite runs 2 shuffle partitions; with 2, the MEDIAN partition
      // size is the hot one and skew can never trigger — spread the keys
      s.conf.set("spark.sql.shuffle.partitions", "32")
      s.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      s.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
      s.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "32KB")
      s.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
      val pad = "x" * 64
      val big = s.range(110000).select(
        when(col("id") < 100000, 0L).otherwise(col("id") % 20).as("k"),
        col("id").as("uid"), lit(pad).as("pad"))
      val small = s.range(20).select(col("id").as("k"),
        (col("id") * 10).as("sv"))
      // NOTE: no same-key operator downstream of the join — AQE refuses a
      // skew split that would re-shuffle for a downstream requirement
      // (e.g. a groupBy on the join key), unless forced
      val joined = big.join(small, "k").select(col("uid"))
      val n = joined.collect().length.toLong
      val p = joined.queryExecution.executedPlan.toString
      assert(p.contains("skew=true"),
        "AQE did not mark the hot partition for skew split:\n" + p.take(2000))
      // the explicit fallback: salted join returns the SAME match set
      val salted = graft.operators.RelationalOps
        .saltedJoin(big, small, "k", "uid", nSalts = 8)
      assert(salted.count() == n, "saltedJoin changed the join cardinality")
    } finally saved.foreach { case (k, v) =>
      v.fold(s.conf.unset(k))(s.conf.set(k, _))
    }
  }

  test("q_heavy_hitters: vocab computed once (cached), sketch broadcast, bounded shuffles") {
    val df = SparkEntry.queries("q_heavy_hitters")(spark, dir)
    val p = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    // the per-key exact counts feed BOTH the sketch build and the probe —
    // they must come from one cached subtree, not two corpus scans
    assert("InMemoryTableScan".r.findAllIn(p).size >= 2,
      s"vocab subtree must be cached and reused:\n$p")
    // the d×w sketch rides a broadcast to the probe join
    assert(p.contains("BroadcastHashJoin"), s"sketch probe must broadcast:\n$p")
    // shuffles: vocab reduction + sketch build + final min-group (+ output
    // sort) — all key-bounded; anything more means a corpus-sized replan
    assert("\\(\\d+\\) Exchange".r.findAllIn(p).size <= 4,
      s"unexpected extra shuffles:\n$p")
    spark.catalog.clearCache()
  }

  test("bloomPruneJoin: one codegen filter over the fact scan, no joins, pass superset of match") {
    val li = graft.sources.Tables.lineitem(spark, dir)
    val urgent = graft.sources.Tables.orders(spark, dir)
      .filter(org.apache.spark.sql.functions.col("o_orderpriority") === "1-URGENT")
    val pruned = graft.operators.RelationalOps.bloomPruneJoin(
      li, "l_orderkey", urgent, "o_orderkey", m = 16384L, d = 3)
    val p = pruned.queryExecution.executedPlan.toString
    // r17: the m-bounded bit positions are collected once and the prune is
    // ONE conjunctive filter — no join, no broadcast, no exchange anywhere
    // in the pruned-fact plan (the d stacked broadcast semi probes each
    // paid an exchange + hashed-relation build for a row-local bit test)
    assert(!p.contains("Join"), s"prune must be a filter, not a join:\n$p")
    assert(!p.contains("Exchange"), s"prune plan must be exchange-free:\n$p")
    assert(p.contains("FileScan parquet [l_orderkey"),
      s"fact scan must feed the filter directly:\n$p")
    assert("Filter".r.findAllIn(p).nonEmpty, s"expected the bit-test filter:\n$p")
    // semantics: every true match survives pruning
    val trueMatch = li.join(urgent.select("o_orderkey"),
      li("l_orderkey") === org.apache.spark.sql.functions.col("o_orderkey"),
      "left_semi").count()
    val passed = pruned.count()
    assert(passed >= trueMatch && passed <= li.count())
  }

  test("columnLineage traces through multi-hop aliases and aggregates") {
    import org.apache.spark.sql.functions._
    val s = spark
    val docs = s.read.parquet(s"$dir/documents.parquet")
    // two alias hops + a filter + an aggregate mixing two source columns
    val frame = docs
      .select(org.apache.spark.sql.functions.col("doc_id"),
        (length(org.apache.spark.sql.functions.col("text")) +
          org.apache.spark.sql.functions.col("n_chars")).as("mix"),
        org.apache.spark.sql.functions.col("lang").as("l1"))
      .filter(org.apache.spark.sql.functions.col("doc_id") > 0)
      .select(org.apache.spark.sql.functions.col("l1").as("l2"),
        org.apache.spark.sql.functions.col("mix"))
      .groupBy("l2")
      .agg(sum(org.apache.spark.sql.functions.col("mix")).as("total"))
    val got = graft.plans.Lineage.columnLineage(frame)
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
    assert(got === Set(
      ("l2", "documents", "lang"),
      ("total", "documents", "text"),
      ("total", "documents", "n_chars")))
  }

  test("q_topk_per_group: bounded aggregator, not a window over all rows") {
    val p = formatted("q_topk_per_group")
    // the point of TopKAgg: partial+final object aggregation with <= k
    // state — never a per-group Window sorting every row
    assert(!p.contains("Window"), "top-k degraded to the window form")
    assert("ObjectHashAggregate|SortAggregate".r.findAllIn(p).size >= 2,
      "expected partial+final typed aggregation")
  }

  test("pageRank contribution join reuses the edges' one-time partitioning") {
    import org.apache.spark.sql.functions._
    val s = spark
    import s.implicits._
    // the exact per-iteration join shape from GraphOps.pageRank: edges
    // repartitioned by src ONCE and persisted; with broadcast off, only
    // the (node, rank) side and the dst aggregation may shuffle per round
    val prev = s.conf.get("spark.sql.autoBroadcastJoinThreshold")
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val e = (1L to 200L).map(i => (i % 20, i % 31)).toDF("src", "dst")
        .where(col("src") =!= col("dst")).distinct()
        .repartition(col("src")).persist()
      e.count() // materialize the cache so the reused partitioning is real
      val ranks = (0L until 31L).map(i => (i, 1.0 / 31)).toDF("node", "rank")
      val deg = e.groupBy("src").agg(count(lit(1)).as("outdeg"))
      val contribs = e.join(ranks, e("src") === ranks("node"))
        .join(deg, "src")
        .select(col("dst").as("node"), (col("rank") / col("outdeg")).as("c"))
        .groupBy("node").agg(sum(col("c")).as("contrib"))
      val p = contribs.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      assert(p.contains("InMemoryTableScan"), "edges must come from the cache")
      // the e side must NOT re-shuffle: its merge-join Sort sits DIRECTLY
      // on the cache scan (an Exchange between them = partitioning lost).
      // (A plain Exchange count would miscount: the formatted output also
      // prints the one-time cache-build Exchanges inside InMemoryRelation.)
      assert("Sort \\(\\d+\\)\\s*\\n[\\s:]*\\+- InMemoryTableScan".r
        .findFirstIn(p).isDefined,
        s"edges side re-shuffles per iteration:\n$p")
      assert(!p.contains("CartesianProduct"), "contribution join degraded")
      e.unpersist()
    } finally s.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}
