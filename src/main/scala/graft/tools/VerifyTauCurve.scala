package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.streaming.StreamingDedup

/** Operating curve for the folding loop's in-loop VERIFY tier (VERDICT
  * r15 item 4): `verifyTau` decides what `near_verified` MEANS at 100 TB,
  * and until now it was correctness-gated but unmeasured. This measures
  * precision / recall / false-reject as a function of tau on a LABELED
  * near-dup fixture, running the REAL ingestion transition
  * ([[StreamingDedup.applyIncrementalBatch]]) at every tau — not a
  * re-derivation of its math.
  *
  * Fixture: `nBase` seed docs of `T` unique tokens each (cross-pair
  * shingle Jaccard 0 by construction); each gets ONE arrival variant
  * keeping a prefix of `m` tokens (m cycles over a grid), so the pair's
  * exact 3-shingle Jaccard is the engineered (m−2)/(2(T−2)−(m−2)) —
  * swept through ~0.07..0.85. Ground-truth label: exact Jaccard ≥ 0.5
  * (the standard MinHash dedup threshold).
  *
  * Per tau ∈ {4..14}/16 the arrivals run one batch against the seeded
  * index and the match classifications are scored against the labels:
  *  - precision           = TP / (TP + FP) over `near_verified`
  *  - recall_candidates   = TP / (actual dups that were CANDIDATES)
  *  - false_reject        = candidates with J ≥ 0.5 the tier REJECTED
  *  - recall_e2e          = TP / (all actual dups) — also charges the
  *    4-band×4-row LSH miss (1−(1−J⁴)⁴ collision: at J just over 0.5
  *    most pairs never become candidates; tau cannot recover those)
  *
  * Usage: `runMain graft.tools.VerifyTauCurve [nBase] [tokensPerDoc]`.
  * Prints one JSON line with one row per tau plus the candidate-coverage
  * census.
  */
object VerifyTauCurve {
  def main(args: Array[String]): Unit = {
    val nBase = args.headOption.map(_.toInt).getOrElse(400)
    val bigT = args.lift(1).map(_.toInt).getOrElse(60)
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    // kept-prefix grid: m tokens shared -> s = m-2 shared 3-shingles of
    // 58 per side; J = s / (116 - s). Chosen to straddle J = 0.5 densely.
    val grid = Seq(10, 16, 22, 28, 34, 38, 40, 42, 44, 48, 52, 55)
    def tokens(doc: Int, tag: String, from: Int, until: Int): Seq[String] =
      (from until until).map(j => s"${tag}${doc}_t$j")
    val rows = (0 until nBase).flatMap { i =>
      val m = grid(i % grid.size)
      val base = tokens(i, "d", 0, bigT)
      val variant = tokens(i, "d", 0, m) ++ tokens(i, "v", m, bigT)
      val s = (m - 2).toDouble
      val j = s / (2.0 * (bigT - 2) - s)
      Seq((i.toLong, base.mkString(" "), -1.0, false),
        (100000L + i, variant.mkString(" "), j, j >= 0.5))
    }
    val df = rows.toDF("doc_id", "text", "jaccard", "is_dup")
    val bases = df.filter(col("jaccard") < 0)
      .select("doc_id", "text")
    val variants = df.filter(col("jaccard") >= 0)
    val labels = variants.select(col("doc_id").as("id"),
      col("jaccard"), col("is_dup")).collect()
      .map(r => r.getLong(0) -> (r.getDouble(1), r.getBoolean(2))).toMap
    val nDup = labels.count(_._2._2)

    def runAt(tau: Double): Map[Long, String] = {
      val root = java.nio.file.Files
        .createTempDirectory(s"graft_taucurve").toString
      StreamingDedup.seedIndex(bases, "doc_id", "text", 3, s"$root/idx")
      StreamingDedup.applyIncrementalBatch(
        variants.select("doc_id", "text"), 0L, "doc_id", "text", 3,
        s"$root/idx", s"$root/out", maxIndexFiles = 0, verifyTau = tau)
      spark.read.parquet(s"$root/out")
        .filter(col("tier").isin("near", "near_verified"))
        .select("id", "tier").collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
    }

    // tau = 0: the candidate universe (everything the 4x4 banding found)
    val candidates = runAt(0.0).keySet
    val candDup = candidates.count(id => labels(id)._2)
    val bandMissed = nDup - candDup

    val curve = (4 to 14).map { t =>
      val tau = t / 16.0
      val verified = runAt(tau).filter(_._2 == "near_verified").keySet
      val tp = verified.count(id => labels(id)._2)
      val fp = verified.size - tp
      val falseReject = candDup - tp
      val prec = if (verified.isEmpty) 1.0 else tp.toDouble / verified.size
      s"""{"tau":"$t/16","precision":${math.round(prec * 1e4) / 1e4},""" +
        s""""recall_candidates":${math.round(tp.toDouble / candDup * 1e4) / 1e4},""" +
        s""""recall_e2e":${math.round(tp.toDouble / nDup * 1e4) / 1e4},""" +
        s""""false_rejects":$falseReject,"tp":$tp,"fp":$fp}"""
    }
    println(s"""{"tool":"verify_tau_curve","n_pairs":$nBase,""" +
      s""""n_actual_dups":$nDup,"n_candidates":${candidates.size},""" +
      s""""candidate_dups":$candDup,"band_missed_dups":$bandMissed,""" +
      s""""curve":[${curve.mkString(",")}]}""")
    spark.stop()
  }
}
