package graft.tools

import org.apache.spark.sql.SparkSession

import graft.operators.SimilarityOps

/** Recall@k-vs-nProbe curve over a testdata embeddings table — the tuning
  * table a retrieval deployment reads before picking its probe budget
  * (recall rises with lists probed; cost is the probed fraction of the
  * corpus). Composes [[SimilarityOps.annRecallReport]] at each nProbe.
  *
  * Usage: `runMain graft.tools.AnnCurve [sfDir] [k] [nQueries] [nlist] [arms]`
  * `arms` = comma list of {curve, pq_budget, sampled_train} (default all —
  * a big scaled table can run just the arm under study).
  * Prints one JSON line: per-nProbe recall for every tier.
  */
object AnnCurve {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val k = args.lift(1).map(_.toInt).getOrElse(10)
    val nq = args.lift(2).map(_.toLong).getOrElse(8L)
    val nlist = args.lift(3).map(_.toInt).getOrElse(8)
    val arms = args.lift(4).map(_.split(",").toSet)
      .getOrElse(Set("curve", "pq_budget", "sampled_train"))
    // ivf_scale is opt-in (√n-sized nlist — meant for the big scaled table)
    val spark = SparkSession.builder()
      .master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val emb = graft.sources.Tables.embeddings(spark, dir)
    val probes = Iterator.iterate(1)(_ * 2).takeWhile(_ <= nlist).toSeq
    val rows = if (!arms("curve")) Seq.empty[String] else {
    val cents = SimilarityOps.ivfCentroids(emb, "vec_id", "embedding",
      k = nlist, iters = 3, dimHint = 64)
    val books = SimilarityOps.pqCodebooks(emb, "vec_id", "embedding",
      m = 8, k = 16, iters = 2, dimHint = 64)
    probes.map { np =>
      val t0 = System.nanoTime()
      val rep = SimilarityOps.annRecallReport(emb, "vec_id", "embedding",
        k, nq, cents, np, books, dimHint = 64)
        .collect().map(r => r.getAs[String]("tier") ->
          r.getAs[Double]("recall")).toMap
      val sec = (System.nanoTime() - t0) / 1e9
      s"""{"n_probe":$np,"ivf":${rep("ivf")},"pq":${rep("pq")},""" +
        s""""sq8":${rep("sq8")},"binary":${rep("binary")},"sec":$sec}"""
    }
    }

    // PQ CODE-BUDGET arm: recall@k vs codebook geometry at a fixed byte
    // budget (the other axis a deployment tunes — FAISS's mxk tables).
    // Bytes/vector = m·log2(k)/8; (8,256) and (16,16) spend the SAME
    // 8 bytes, trading subspace count against per-subspace resolution.
    import org.apache.spark.sql.functions.{broadcast, col, count, lit}
    lazy val truth = graft.core.Materialize.pin(
      SimilarityOps.topKCosine(emb, "vec_id", "embedding", k, nq)
        .select(col("ia").as("q"), col("ib").as("nb")))
    lazy val possible = truth.count().toDouble
    val budgets = Seq((8, 16), (8, 64), (8, 256), (16, 16), (16, 256))
    val pqRows = if (!arms("pq_budget")) Seq.empty[String]
    else budgets.map { case (m, kk) =>
      val t0 = System.nanoTime()
      val cb = SimilarityOps.pqCodebooks(emb, "vec_id", "embedding",
        m = m, k = kk, iters = 2, dimHint = 64)
      val hits = SimilarityOps.pqTopK(emb, "vec_id", "embedding", k, nq,
        cb, dimHint = 64)
        .select(col("ia").as("q"), col("ib").as("nb"))
        .join(broadcast(truth), Seq("q", "nb"), "left_semi")
        .agg(count(lit(1))).collect()(0).getLong(0)
      val sec = (System.nanoTime() - t0) / 1e9
      val bits = m * (math.log(kk) / math.log(2)).round
      s"""{"m":$m,"k_codebook":$kk,"bytes_per_vec":${bits / 8.0},""" +
        s""""recall":${hits / possible},"sec":$sec}"""
    }
    // SAMPLED-TRAIN arm: the FAISS discipline — Lloyd on a deterministic
    // id-hash sample instead of full-corpus scans per round. Production
    // question: how much recall does a 10× / 20× cheaper training pass
    // give up at a fixed probe budget? (Answer it with measurements, not
    // the folklore.) Uses the SAME ground truth as the budget arm.
    val sampleArm = if (!arms("sampled_train")) Seq.empty[String]
    else Seq(1.0, 0.1, 0.05).map { frac =>
      val t0 = System.nanoTime()
      val (cents, books) = SimilarityOps.annTrain(emb, "vec_id", "embedding",
        nlist = nlist, m = 8, k = 16, ivfIters = 3, pqIters = 2,
        dimHint = 64, trainSampleFraction = frac)
      val trainSec = (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime()
      val hits = SimilarityOps.ivfPqTopK(emb, "vec_id", "embedding", k, nq,
        cents, books, nProbe = nlist, dimHint = 64)
        .select(col("ia").as("q"), col("ib").as("nb"))
        .join(broadcast(truth), Seq("q", "nb"), "left_semi")
        .agg(count(lit(1))).collect()(0).getLong(0)
      val rankSec = (System.nanoTime() - t1) / 1e9
      s"""{"train_fraction":$frac,"recall":${hits / possible},""" +
        s""""train_sec":$trainSec,"rank_sec":$rankSec}"""
    }
    // RESIDUAL arm (run on the CLUSTERED fixture — ClusteredEmbeddings —
    // where the r14 table measured raw SQ8 collapsing 0.725 → 0.425):
    // quantize x − centroid(x) instead of raw x, at IDENTICAL
    // bytes/vector, and probe ALL lists so the comparison isolates
    // quantizer quality from coarse-pruning recall. The FAISS residual
    // discipline: the raw quantizer spends its 256 levels on the corpus
    // span; the residual one spends them on within-cluster gaps — the
    // distances that decide rankings on clustered data.
    val residualArm = if (!arms("residual")) Seq.empty[String]
    else {
      val qids = (0L until nq).toSeq
      def dropSelfRecall(d: org.apache.spark.sql.DataFrame): Double = {
        import org.apache.spark.sql.expressions.Window
        import org.apache.spark.sql.functions.row_number
        val w = Window.partitionBy(col("q")).orderBy(col("rank"))
        val hits = d.filter(col("q") =!= col("nb"))
          .withColumn("_rk", row_number().over(w)).filter(col("_rk") <= k)
          .select("q", "nb")
          .join(broadcast(truth), Seq("q", "nb"), "left_semi")
          .agg(count(lit(1))).collect()(0).getLong(0)
        hits / possible
      }
      val cents = SimilarityOps.ivfCentroids(emb, "vec_id", "embedding",
        k = nlist, iters = 3, dimHint = 64)
      val t0 = System.nanoTime()
      val sq8Raw = dropSelfRecall(
        SimilarityOps.int8TopK(emb, "vec_id", "embedding", qids, k + 1)
          .select(col("qid").as("q"), col("vec_id").as("nb"), col("rank")))
      val t1 = System.nanoTime()
      val sq8Res = dropSelfRecall(
        SimilarityOps.ivfSq8ResidualTopK(emb, "vec_id", "embedding", qids,
          k + 1, cents, nProbe = nlist)
          .select(col("qid").as("q"), col("vec_id").as("nb"), col("rank")))
      val t2 = System.nanoTime()
      def pqRecall(d: org.apache.spark.sql.DataFrame): Double = {
        val hits = d.select(col("ia").as("q"), col("ib").as("nb"))
          .join(broadcast(truth), Seq("q", "nb"), "left_semi")
          .agg(count(lit(1))).collect()(0).getLong(0)
        hits / possible
      }
      val books = SimilarityOps.pqCodebooks(emb, "vec_id", "embedding",
        m = 8, k = 16, iters = 2, dimHint = 64)
      val pqRaw = pqRecall(SimilarityOps.pqTopK(emb, "vec_id", "embedding",
        k, nq, books, dimHint = 64))
      val t3 = System.nanoTime()
      val rBooks = SimilarityOps.pqCodebooks(
        SimilarityOps.residualFrame(emb, "vec_id", "embedding", cents),
        "vec_id", "resid", m = 8, k = 16, iters = 2, dimHint = 64)
      val pqRes = pqRecall(SimilarityOps.ivfPqResidualTopK(emb, "vec_id",
        "embedding", k, nq, cents, rBooks, nProbe = nlist, dimHint = 64))
      val t4 = System.nanoTime()
      // norm-corrected PQ residual: rank by cosine of the reconstruction
      // (true-norm sidecar), the r16 lift — same codes, same bytes
      val pqResCos = pqRecall(SimilarityOps.ivfPqResidualCosineTopK(emb,
        "vec_id", "embedding", k, nq, cents, rBooks, nProbe = nlist,
        dimHint = 64))
      val t5 = System.nanoTime()
      Seq(
        s"""{"tier":"sq8_raw","bytes_per_vec":64,"recall":$sq8Raw,"sec":${(t1 - t0) / 1e9}}""",
        s"""{"tier":"sq8_residual","bytes_per_vec":64,"recall":$sq8Res,"sec":${(t2 - t1) / 1e9}}""",
        s"""{"tier":"pq_raw_8x16","bytes_per_vec":4,"recall":$pqRaw,"sec":${(t3 - t2) / 1e9}}""",
        s"""{"tier":"pq_residual_8x16","bytes_per_vec":4,"recall":$pqRes,"sec":${(t4 - t3) / 1e9}}""",
        s"""{"tier":"pq_residual_cos_8x16","bytes_per_vec":4,"recall":$pqResCos,"sec":${(t5 - t4) / 1e9}}""")
    }
    // RESIDUAL-BUDGET arm (VERDICT r15 item 2): bytes/vector → attainable
    // recall for RESIDUAL PQ on the clustered fixture at nlist ≥ clusters
    // — the honest operating envelope. Measured finding behind it: at
    // 4 B codes the ceiling is QUANTIZER RESOLUTION (16 entries per
    // 8-dim subspace), not norm bias — the polarization-identity cosine
    // ranker (ivfPqResidualCosineTopK) moves recall ≤0.04 at every
    // geometry, so both rankers are tabled and the envelope is what a
    // caller trusts: pick bytes for the recall class you need.
    val residualBudget = if (!arms("residual_budget")) Seq.empty[String]
    else {
      val cents = SimilarityOps.ivfCentroids(emb, "vec_id", "embedding",
        k = nlist, iters = 3, dimHint = 64)
      val rf = SimilarityOps.residualFrame(emb, "vec_id", "embedding", cents)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      rf.count()
      def pqRecall2(d: org.apache.spark.sql.DataFrame): Double = {
        val hits = d.select(col("ia").as("q"), col("ib").as("nb"))
          .join(broadcast(truth), Seq("q", "nb"), "left_semi")
          .agg(count(lit(1))).collect()(0).getLong(0)
        hits / possible
      }
      val grid = Seq((8, 16), (8, 64), (8, 256), (16, 16), (16, 256))
      val out = grid.map { case (m, kk) =>
        val t0 = System.nanoTime()
        val rBooks = SimilarityOps.pqCodebooks(rf, "vec_id", "resid",
          m = m, k = kk, iters = 4, dimHint = 64)
        val trainSec = (System.nanoTime() - t0) / 1e9
        val rec = pqRecall2(SimilarityOps.ivfPqResidualTopK(emb, "vec_id",
          "embedding", k, nq, cents, rBooks, nProbe = nlist, dimHint = 64))
        val recCos = pqRecall2(SimilarityOps.ivfPqResidualCosineTopK(emb,
          "vec_id", "embedding", k, nq, cents, rBooks, nProbe = nlist,
          dimHint = 64))
        val bytes = m * (math.log(kk) / math.log(2)).round / 8.0
        s"""{"m":$m,"k_codebook":$kk,"code_bytes":$bytes,""" +
          s""""bytes_with_sidecar":${bytes + 4},"recall_l2":$rec,""" +
          s""""recall_cos":$recCos,"train_sec":$trainSec}"""
      }
      rf.unpersist()
      out
    }
    // IVF-SCALE arm: production-shaped nlist (≈√n) — possible at all only
    // with the FloatDotTable kernel (the literal-dot fan failed janino
    // past a few hundred centroids). Sampled training (the FAISS
    // discipline), then one probe-bounded search; reports the two walls.
    val ivfScale = if (!arms("ivf_scale")) Seq.empty[String]
    else {
      val nTotal = emb.count()
      val bigList = math.max(64,
        math.min(4096, math.round(math.sqrt(nTotal.toDouble)).toInt))
      val frac = math.min(1.0, math.max(0.02, (bigList * 50.0) / nTotal))
      val t0 = System.nanoTime()
      val cents = SimilarityOps.ivfCentroids(emb, "vec_id", "embedding",
        k = bigList, iters = 2, dimHint = 64, trainSampleFraction = frac)
      val trainSec = (System.nanoTime() - t0) / 1e9
      // index BUILD (the one O(n·nlist·dim) pass, paid once) measured
      // apart from the per-query-batch probe cost a deployment tunes —
      // then the TWO-LEVEL build (supergroup pre-scan, ~an order fewer
      // dots) on the same centroids: build wall and probe recall for
      // both, so the approximate-assignment trade is a measured number
      val np = math.max(1, bigList / 32)
      def recallOf(lists: org.apache.spark.sql.DataFrame): (Double, Long) = {
        val d = SimilarityOps.ivfTopKOverLists(lists, emb, "vec_id",
          "embedding", k, nq, cents, nProbe = np)
        val hits = d.select(col("ia").as("q"), col("ib").as("nb"))
          .join(broadcast(truth), Seq("q", "nb"), "left_semi")
          .agg(count(lit(1))).collect()(0).getLong(0)
        (hits / possible, hits)
      }
      val t1 = System.nanoTime()
      val flat = SimilarityOps.ivfLists(emb, "vec_id", "embedding", cents)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      flat.count()
      val buildSec = (System.nanoTime() - t1) / 1e9
      val t2 = System.nanoTime()
      val (flatRecall, _) = recallOf(flat)
      val probeSec = (System.nanoTime() - t2) / 1e9
      flat.unpersist()
      val t3 = System.nanoTime()
      val two = SimilarityOps.ivfListsTwoLevel(emb, "vec_id", "embedding",
        cents, sProbe = 3)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      two.count()
      val build2Sec = (System.nanoTime() - t3) / 1e9
      val (twoRecall, _) = recallOf(two)
      two.unpersist()
      // corpus-as-queries ASSIGNMENT wall (VERDICT r15 item 7):
      // centroidAssignment at a small sProbe rides the same two-level
      // kernel as the build, so its wall should sit in the two-level
      // build's class, not the flat scan's
      val t4 = System.nanoTime()
      SimilarityOps.centroidAssignment(emb, "vec_id", "embedding", cents,
        sProbe = 3).write.mode("overwrite").format("noop").save()
      val assignSec = (System.nanoTime() - t4) / 1e9
      Seq(s"""{"nlist":$bigList,"train_fraction":$frac,"n_vectors":$nTotal,""" +
        s""""train_sec":$trainSec,"build_sec":$buildSec,""" +
        s""""probe_sec":$probeSec,"recall":$flatRecall,""" +
        s""""twolevel_build_sec":$build2Sec,"twolevel_recall":$twoRecall,""" +
        s""""build_speedup":${buildSec / build2Sec},""" +
        s""""assign_sprobe3_sec":$assignSec}""")
    }
    // IVF-APPEND arm: append cost must follow the BATCH, not the corpus —
    // the whole point of the appendable index (a rebuild's cost grows with
    // the corpus; an append's must not). Build once per corpus scale
    // (1×/2×/4× the table, ids offset to stay unique), then time one
    // fixed-size append into each: flat walls across scales = the claim.
    val ivfAppend = if (!arms("ivf_append")) Seq.empty[String]
    else {
      import org.apache.spark.sql.functions.expr
      val batch = emb.limit(2000)
        .select((col("vec_id") + 90000000L).as("vec_id"), col("embedding"))
      val cents = SimilarityOps.ivfCentroids(emb, "vec_id", "embedding",
        k = nlist, iters = 2, dimHint = 64)
      Seq(1, 2, 4).map { mult =>
        val corpus = (0 until mult).map(i =>
          emb.select((col("vec_id") + i.toLong * 10000000L).as("vec_id"),
            col("embedding"))).reduce(_ unionByName _)
        val n = corpus.count()
        val dir = s"${System.getProperty("java.io.tmpdir")}/graft_annappend_$mult"
        val root = new java.io.File(dir)
        def rm(f: java.io.File): Unit = {
          if (f.isDirectory) f.listFiles().foreach(rm)
          f.delete(); ()
        }
        if (root.exists()) rm(root)
        val t0 = System.nanoTime()
        SimilarityOps.saveIvfIndex(
          SimilarityOps.ivfLists(corpus, "vec_id", "embedding", cents),
          cents, dir)
        val buildSec = (System.nanoTime() - t0) / 1e9
        val t1 = System.nanoTime()
        SimilarityOps.appendToIvfIndex(batch, "vec_id", "embedding", dir,
          sProbe = 3)
        val appendSec = (System.nanoTime() - t1) / 1e9
        s"""{"corpus_mult":$mult,"n_vectors":$n,"batch_rows":2000,""" +
          s""""build_sec":$buildSec,"append_sec":$appendSec}"""
      }
    }
    println(s"""{"tool":"ann_curve","sf_dir":"$dir","k":$k,""" +
      s""""n_queries":$nq,"nlist":$nlist,"curve":[${rows.mkString(",")}],""" +
      s""""pq_budget":[${pqRows.mkString(",")}],""" +
      s""""sampled_train":[${sampleArm.mkString(",")}],""" +
      s""""residual":[${residualArm.mkString(",")}],""" +
      s""""ivf_scale":[${ivfScale.mkString(",")}],""" +
      s""""ivf_append":[${ivfAppend.mkString(",")}],""" +
      s""""residual_budget":[${residualBudget.mkString(",")}]}""")
    spark.stop()
  }
}
