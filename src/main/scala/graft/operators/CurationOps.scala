package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Text

/** Training-data curation operators beyond the dedup/similarity families:
  * PII-style redaction, quality gating, stratified sampling, and
  * token-budget selection. All narrow or single-shuffle.
  */
object CurationOps {

  /** Deterministic train/val/test split assignment — every training-data
    * release ends with one: each row lands in exactly one named split by
    * its id's md5 bucket against cumulative weight boundaries, so the
    * assignment is a pure row function (stable under any partitioning,
    * reshuffling, or corpus growth — an id keeps its split forever, the
    * property that prevents silent train/test leakage across releases).
    * Same 60-bit md5 bucket draw as the samplers.
    */
  def assignSplits(df: DataFrame, keyCol: String,
                   splits: Seq[(String, Double)]): DataFrame = {
    require(splits.nonEmpty && splits.forall(_._2 > 0),
      s"splits must be positive: $splits")
    require(math.abs(splits.map(_._2).sum - 1.0) < 1e-9,
      s"split weights must sum to 1: $splits")
    val bucket = conv(substring(md5(col(keyCol).cast("string").cast("binary")),
      1, 15), 16, 10).cast("long") % 10000L
    val bounds = splits.scanLeft(0.0)(_ + _._2).tail.map(b => (b * 10000).round)
    val expr = splits.map(_._1).zip(bounds).reverse
      .foldLeft(lit(splits.last._1): Column) { case (els, (name, hi)) =>
        when(bucket < hi, lit(name)).otherwise(els)
      }
    df.withColumn("split", expr)
  }

  /** Differentially-private noisy counts (the Laplace mechanism for
    * count queries, sensitivity 1, ε-DP: Dwork et al. 2006) — the
    * publishable tier above [[privacyReport]]'s k-anonymity censuses.
    * The Laplace draw inverts a uniform derived from a seeded md5 hash
    * of the GROUP KEY (u = hash60/2⁶⁰, noise = −(1/ε)·sign(u−½)·
    * ln(1−2|u−½|)), so the mechanism is deterministic per (key, seed) —
    * reproducible releases, engine-replayable tests — while behaving
    * distributionally like Laplace across keys. NOTE: determinism per
    * key is a release-reproducibility choice; rotating `seed` per
    * release restores the fresh-draw privacy accounting. One grouped
    * count, noise as pure column arithmetic — no second pass. The true
    * `n` stays in the output for the oracle gate; a real release drops
    * it.
    */
  def dpNoisyCounts(df: DataFrame, groupCol: String, epsilon: Double,
                    seed: Long): DataFrame = {
    require(epsilon > 0, s"epsilon must be positive: $epsilon")
    val b = 1.0 / epsilon
    val u = graft.functions.Text.hash64(
      concat(col(groupCol).cast("string"), lit("#"), lit(seed.toString)))
      .cast("double") / lit(1152921504606846976.0) // 2^60: u ∈ [0, 1)
    val c = u - 0.5
    val noise = -lit(b) * signum(c) *
      log(greatest(lit(1e-12), lit(1.0) - lit(2.0) * abs(c)))
    df.groupBy(col(groupCol))
      .agg(count(lit(1)).as("n"))
      .withColumn("noisy", col("n") + noise)
  }

  /** Leakage-safe split assignment — the guard published dedup work
    * exists for (near-duplicates of training text leaking into the test
    * split inflate eval): near-dup PAIRS resolve to connected components
    * first, and the split hashes the COMPONENT id, so every member of a
    * duplicate cluster lands in the same split BY CONSTRUCTION — no
    * post-hoc violation scan needed. Composes the public pieces: any
    * pair source (LSH→Jaccard, simhash, embedding ANN) →
    * [[graft.operators.DedupOps.connectedComponents]] → [[assignSplits]]
    * on the component key.
    */
  def leakageSafeSplits(df: DataFrame, idCol: String, pairs: DataFrame,
                        splits: Seq[(String, Double)]): DataFrame =
    assignSplits(
      graft.operators.DedupOps.connectedComponents(
        df.select(col(idCol)), idCol, pairs),
      "component", splits)

  /** Morton/Z-order interleave of two bounded-int columns — the
    * multi-column data-clustering key lakehouse layouts sort by (Delta's
    * OPTIMIZE ZORDER, Hudi clustering — public techniques): sorting by
    * the interleaved value keeps rows close in BOTH dimensions close in
    * the file order, so min/max pruning works for either predicate. Bit
    * positions are disjoint, so the interleave is a SUM of shifted
    * bit-tests — pure integer column arithmetic, codegen'd, identical in
    * any engine.
    */
  def zValue(x: Column, y: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, s"bits $bits out of [1, 31]")
    (0 until bits).map { i =>
      shiftleft(shiftrightunsigned(x.cast("long"), i).bitwiseAND(lit(1L)), 2 * i) +
        shiftleft(shiftrightunsigned(y.cast("long"), i).bitwiseAND(lit(1L)), 2 * i + 1)
    }.reduce(_ + _)
  }

  /** Z-order locality report: rows bucketed by the TOP bits of their
    * interleaved key, per-bucket bounding boxes in both source
    * dimensions — the evidence that a z-sorted layout confines each
    * bucket (≈ file) to a small rectangle, which is exactly what makes
    * min/max pruning effective on either column.
    */
  def zOrderStats(df: DataFrame, xCol: String, yCol: String, bits: Int,
                  bucketShift: Int): DataFrame =
    df.withColumn("_z", zValue(col(xCol), col(yCol), bits))
      .groupBy(shiftrightunsigned(col("_z"), bucketShift).as("bucket"))
      .agg(count(lit(1)).as("n"),
        min(col(xCol)).as("min_x"), max(col(xCol)).as("max_x"),
        min(col(yCol)).as("min_y"), max(col(yCol)).as("max_y"))

  /** Exact-N-per-group deterministic sample: the md5-bucket priority draw
    * (reshuffle-stable, corpus-growth-stable per key) reduced with the
    * bounded [[graft.functions.TopKAgg]] — so "exactly N docs per
    * language" costs N rows per group per partition across the shuffle,
    * never a per-group sort. The fixed-N complement of the
    * fraction-based `stratifiedSampleByHash`.
    */
  def sampleNPerGroup(df: DataFrame, groupCol: String, keyCol: String,
                      n: Int): DataFrame = {
    val prio = conv(substring(md5(col(keyCol).cast("string").cast("binary")),
      1, 15), 16, 10).cast("long").cast("double")
    graft.functions.TopK.topKPerGroup(
      df.withColumn("_prio", prio), groupCol, keyCol, "_prio", n)
      .withColumnRenamed("_prio", "prio")
  }

  /** Corpus snapshot diff — the bookkeeping step between two crawl/curation
    * snapshots (what did release N+1 add, drop, or rewrite?): one full
    * outer join on the document id comparing content fingerprints. One
    * id-keyed shuffle regardless of corpus size; fingerprints are md5
    * column expressions, so no text ever crosses the shuffle — only
    * (id, 32-hex) rows.
    */
  def corpusDiff(a: DataFrame, b: DataFrame, idCol: String,
                 textCol: String): DataFrame = {
    val fa = a.select(col(idCol).as("_id"), md5(col(textCol)).as("_ha"))
    val fb = b.select(col(idCol).as("_id"), md5(col(textCol)).as("_hb"))
    fa.join(fb, Seq("_id"), "full_outer")
      .select(col("_id").as(idCol),
        when(col("_ha").isNull, "added")
          .when(col("_hb").isNull, "removed")
          .when(col("_ha") =!= col("_hb"), "changed")
          .otherwise("unchanged").as("status"))
  }

  /** Redaction patterns (valid in Java regex AND RE2 so oracles mirror them
    * verbatim): emails, bare URLs, long digit runs (ids/phones).
    */
  val redactions: Seq[(String, String)] = Seq(
    "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}" -> "<EMAIL>",
    "https?://[^\\s]+" -> "<URL>",
    "[0-9]{7,}" -> "<NUM>")

  /** Scrub sensitive spans from a text column (applied in declaration order). */
  def redact(c: Column): Column =
    redactions.foldLeft(c) { case (acc, (pat, rep)) =>
      regexp_replace(acc, pat, rep)
    }

  /** Quality gate: keep docs whose quality features pass thresholds —
    * a predicate over `TextOps.qualityFeatures` output, pushed to the scan
    * when the features are materialized columns.
    */
  def qualityGate(features: DataFrame, minTokens: Long, minStopRatio: Double,
                  maxDigitRatio: Double): DataFrame =
    features.filter(col("n_tokens") >= minTokens &&
      col("stop_ratio") >= minStopRatio && col("digit_ratio") <= maxDigitRatio)

  /** Seeded stratified sample: per-stratum fractions via `sampleBy` —
    * deterministic for a fixed seed and partitioning.
    */
  def stratifiedSample(df: DataFrame, stratumCol: String,
                       fractions: Map[String, Double], seed: Long): DataFrame =
    df.stat.sampleBy(stratumCol, fractions, seed)

  /** Content-hash stratified sample: keep a row when its key's 60-bit md5
    * bucket (of 10 000) falls under the stratum's fraction. Unlike
    * `sampleBy` (rand per row ⇒ result depends on partitioning), this is a
    * pure row function — identical output on any cluster layout, any rerun,
    * any engine — which is what a 100 TB training-mix split actually needs.
    * Strata absent from `fractions` are dropped (sampleBy's contract).
    */
  def stratifiedSampleByHash(df: DataFrame, stratumCol: String, keyCol: String,
                             fractions: Map[String, Double]): DataFrame = {
    val bucket = conv(substring(md5(col(keyCol).cast("string").cast("binary")), 1, 15),
      16, 10).cast("long") % 10000L
    val fracCol = fractions.foldLeft(lit(0.0)) { case (acc, (k, v)) =>
      when(col(stratumCol) === k, lit(v)).otherwise(acc)
    }
    df.filter(bucket < fracCol * 10000.0)
  }

  /** Length-bucketed batching report: sequences grouped into
    * `width`-token buckets (capped at `maxLen` — the training context),
    * with the padding waste each bucket pays when batches pad to the
    * bucket boundary. Bucketing by length is the standard alternative to
    * packing when example boundaries must survive; this report is how a
    * pipeline picks width/maxLen. One projection + one bucket-keyed
    * aggregate (state = maxLen/width rows).
    */
  def lengthBuckets(df: DataFrame, idCol: String, nTokensCol: String,
                    width: Int, maxLen: Int): DataFrame = {
    require(width > 0 && maxLen > 0 && maxLen % width == 0,
      s"width=$width must divide maxLen=$maxLen")
    val cap = least(col(nTokensCol).cast("long"), lit(maxLen.toLong))
    df.select(col(idCol), cap.as("_cap"))
      .withColumn("bucket_len",
        (floor((col("_cap") + (width - 1)) / width) * width).cast("long"))
      .groupBy("bucket_len")
      .agg(count(lit(1)).as("n_seqs"), sum(col("_cap")).as("sum_tokens"))
      .withColumn("n_padded", col("bucket_len") * col("n_seqs"))
      .withColumn("waste_frac",
        when(col("n_padded") > 0,
          lit(1.0) - col("sum_tokens").cast("double") / col("n_padded"))
          .otherwise(lit(0.0)))
  }

  /** Deterministic domain-mixing oversampler: per-source target weight w
    * (w MAY exceed 1 — data-mix recipes repeat high-quality domains for
    * multiple epochs) → ⌊w⌋ full epoch copies of every row plus one
    * hash-selected fractional-epoch copy (the row's 60-bit md5 bucket of
    * 10 000 under the fractional part). Like the other hash samplers, a
    * pure row function — identical output on any partitioning, rerun, or
    * engine — and shuffle-free: the epoch fan-out is a projection explode,
    * so it composes with a downstream writer without materializing the
    * repeated corpus anywhere. Sources absent from `weights` are dropped
    * (an explicit mix is a whitelist).
    */
  def mixSources(df: DataFrame, sourceCol: String, keyCol: String,
                 weights: Map[String, Double]): DataFrame = {
    require(weights.values.forall(w => w >= 0.0 && w <= 1000.0),
      s"mix weights must be in [0, 1000]: $weights")
    val wCol = weights.foldLeft(lit(0.0)) { case (acc, (k, v)) =>
      when(col(sourceCol) === k, lit(v)).otherwise(acc)
    }
    val bucket = conv(substring(md5(col(keyCol).cast("string").cast("binary")), 1, 15),
      16, 10).cast("long") % 10000L
    val nCopies = (floor(wCol) +
      when(bucket < (wCol - floor(wCol)) * 10000.0, 1).otherwise(0)).cast("int")
    df.withColumn("epoch",
      explode(when(nCopies > 0, sequence(lit(0), nCopies - 1))
        .otherwise(array().cast("array<int>"))))
  }

  /** Weighted sample without replacement (Efraimidis–Spirakis A-ES): each
    * row draws a deterministic uniform u from its key's 60-bit md5 bucket
    * and scores key = ln(u)/w — the top-k scores are exactly a w-weighted
    * sample without replacement. Like `stratifiedSampleByHash`, the draw
    * is a pure row function: identical output on any partitioning, rerun,
    * or engine (the "sample docs ∝ quality" operator a training mix
    * needs to be reproducible). Top-k is a TakeOrdered — no global sort.
    */
  def weightedSample(df: DataFrame, keyCol: String, weightCol: String,
                     k: Int): DataFrame = {
    require(k > 0, s"sample size $k must be positive")
    // A-ES is defined for positive weights only — a w <= 0 row would score
    // ln(u)/w >= 0, above every valid row, and silently hijack the sample;
    // zero-weight rows are legitimately unsampleable, so drop them loudly
    // in the contract rather than corrupt the selection.
    val positive = df.filter(col(weightCol) > 0)
    val h = conv(substring(md5(col(keyCol).cast("string").cast("binary")), 1, 15),
      16, 10).cast("long")
    val u = (h.cast("double") + 0.5) / lit(1152921504606846976.0) // 2^60
    // limit-after-sort plans TakeOrdered (per-partition heaps + driver
    // merge of k) — never a global sort; the rank window then runs over
    // only the k survivors
    val winners = positive
      .withColumn("_score", log(u) / col(weightCol).cast("double"))
      .orderBy(col("_score").desc, col(keyCol)).limit(k)
    val w = Window.orderBy(col("_score").desc, col(keyCol))
    winners.withColumn("rank", row_number().over(w))
  }

  /** Group-wise outlier gate: keep rows within `maxZ` population standard
    * deviations of their group mean — the numeric-column cleaning
    * primitive. Group stats are one partial+final aggregation joined back
    * on the group key (broadcastable when groups are bounded), never a
    * per-row window. The z test compares the ROUNDED score (the
    * `cosinePairs` trick) so the kept set is engine-stable at the
    * threshold boundary; degenerate zero-variance groups keep all rows.
    */
  def zScoreFilter(df: DataFrame, groupCol: String, valueCol: String,
                   maxZ: Double): DataFrame = {
    require(maxZ >= 0, s"maxZ $maxZ must be non-negative")
    val stats = df.groupBy(col(groupCol))
      .agg(avg(col(valueCol)).as("_mu"), stddev_pop(col(valueCol)).as("_sd"))
    df.join(stats, groupCol)
      .filter(col("_sd") === 0.0 ||
        round(abs((col(valueCol) - col("_mu")) / col("_sd")) + lit(1e-9), 6) <= maxZ)
      .drop("_mu", "_sd")
  }

  /** k-anonymity / l-diversity privacy report (Sweeney 2002; Machanavajjhala
    * et al. 2007 — the standard release-gate metrics for datasets carrying
    * quasi-identifiers): group by the quasi-identifier tuple, then one
    * summary row — group census, how many groups (and rows) fall below
    * the k-anonymity floor, the minimum group size, and the l-diversity
    * counterparts over the sensitive attribute. Two hash aggregations
    * (quasi-group reduce, then a 1-row fold); the quasi-group reduce is
    * the only data-sized shuffle and combines map-side. A release gate
    * checks `n_groups_below_k == 0 && n_groups_below_l == 0`.
    */
  def privacyReport(df: DataFrame, quasiCols: Seq[String],
                    sensitiveCol: String, k: Long, l: Long): DataFrame = {
    require(quasiCols.nonEmpty, "no quasi-identifier columns")
    df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("n"),
        countDistinct(col(sensitiveCol)).as("n_sens"))
      .agg(count(lit(1)).as("n_groups"),
        sum(when(col("n") < k, 1L).otherwise(0L)).as("n_groups_below_k"),
        sum(when(col("n") < k, col("n")).otherwise(0L)).as("n_rows_at_risk"),
        min(col("n")).as("min_group_size"),
        sum(when(col("n_sens") < l, 1L).otherwise(0L)).as("n_groups_below_l"),
        min(col("n_sens")).as("min_diversity"))
  }

  /** GPT-style sequence packing (concatenate-and-cut): documents are laid
    * end-to-end in `idCol` order and the token stream is cut every
    * `contextLen` tokens. Emits each document's stream offset, its first
    * context window (`pack_id`), and how many windows it spans — the
    * layout a training loader needs to place every document. Offsets come
    * from the two-pass range-partitioned prefix sum
    * (`GraphOps.exclusivePrefixSum`), never a single-task global window.
    */
  def packSequences(df: DataFrame, idCol: String, tokenCol: String,
                    contextLen: Long): DataFrame = {
    require(contextLen > 0, s"context length $contextLen must be positive")
    graft.graph.GraphOps.exclusivePrefixSum(df, idCol, tokenCol, "start_off")
      .withColumn("pack_id", expr(s"start_off div $contextLen"))
      .withColumn("n_packs",
        when(col(tokenCol) > 0,
          expr(s"(start_off + $tokenCol - 1) div $contextLen") - col("pack_id") + 1L)
          .otherwise(0L))
  }

  /** Token-budget selection: per group, keep documents in priority order
    * until the cumulative token count exceeds the budget (greedy prefix).
    * One partition-bounded window — the "fill the training mix" operator.
    */
  def tokenBudgetSelect(df: DataFrame, groupCol: String, orderCol: String,
                        tokenCol: String, budget: Long): DataFrame = {
    val w = Window.partitionBy(col(groupCol)).orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("cum_tokens", sum(col(tokenCol)).over(w))
      .filter(col("cum_tokens") <= budget)
  }

  /** Convenience: documents table → (doc_id, redacted text, token count). */
  def preprocess(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol), redact(col(textCol)).as("text_clean"),
      Text.bpeTokenCount(col(textCol)).cast("long").as("n_tokens"))
}
