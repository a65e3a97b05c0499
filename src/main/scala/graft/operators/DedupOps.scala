package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.Text

/** Deduplication family for training-data curation — exact, MinHash-LSH,
  * SimHash, and n-gram Jaccard. Designed for the 100 TB shape:
  *
  *  - exact dedup is one hash-groupBy (map-side partial agg collapses
  *    duplicates before the shuffle);
  *  - the all-pairs Jaccard join is the *verification* step only — at scale
  *    candidates come from MinHash banding (`bandPairs`), which keeps the
  *    self-join keyed on (band, bandKey) buckets instead of O(n²);
  *  - every hash is md5-derived and engine-reproducible, so results are
  *    deterministic under any partitioning and oracle-checkable.
  */
object DedupOps {

  /** Mersenne prime 2^31−1: keeps `a*h31 + b` inside a 64-bit long. */
  val MinhashPrime = 2147483647L
  val NumPerms = 16
  val BandRows = 4

  /** Deterministic permutation parameters (Knuth multiplicative constants),
    * inlined identically into the oracle SQL.
    */
  val permA: IndexedSeq[Long] =
    (1 to NumPerms).map(i => (2654435761L * i) % MinhashPrime)
  val permB: IndexedSeq[Long] =
    (1 to NumPerms).map(i => (2246822519L * i) % MinhashPrime)

  /** Exact dedup: canonical-content fingerprint groups with the surviving
    * (minimum) id and the duplicate count.
    */
  def exactDupGroups(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(Text.fingerprint(col(textCol)).as("fp"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))

  /** Distinct (id, shingle) rows — the sparse set representation shared by
    * Jaccard and MinHash.
    */
  def shingleSet(df: DataFrame, idCol: String, textCol: String, k: Int): DataFrame =
    df.select(col(idCol), explode(Text.shingles(col(textCol), k)).as("sh"))
      .distinct()

  /** N-gram Jaccard near-dup pairs via the sparse inverted-index join:
    * docs sharing a shingle → common counts → |A∩B| / |A∪B| ≥ τ.
    * `candidates` (e.g. from `bandPairs`) restricts the pair space at scale.
    */
  def jaccardPairs(shingles: DataFrame, idCol: String, tau: Double,
                   candidates: Option[DataFrame] = None): DataFrame = {
    val sizes = shingles.groupBy(col(idCol)).agg(count(lit(1)).as("sz"))
    val a = shingles.select(col(idCol).as("da"), col("sh"))
    val b = shingles.select(col(idCol).as("db"), col("sh"))
    val rawPairs = a.join(b, Seq("sh")).filter(col("da") < col("db"))
    val restricted = candidates.fold(rawPairs)(c => rawPairs.join(c, Seq("da", "db"), "left_semi"))
    restricted
      .groupBy(col("da"), col("db")).agg(count(lit(1)).as("common"))
      .join(sizes.select(col(idCol).as("da"), col("sz").as("sza")), "da")
      .join(sizes.select(col(idCol).as("db"), col("sz").as("szb")), "db")
      .withColumn("jac", col("common").cast("double") /
        (col("sza") + col("szb") - col("common")))
      .filter(col("jac") >= tau)
      .select("da", "db", "jac")
  }

  /** MinHash signatures: one pass over the shingle rows, NumPerms `min`
    * aggregates — no row explosion, partial agg does the heavy lifting.
    */
  def minhashSignatures(shingles: DataFrame, idCol: String): DataFrame = {
    // Materialize the md5-derived hash ONCE per row in a projection below the
    // aggregate — inlining it into the 16 min() update expressions would
    // md5 every shingle 16× in the partial agg.
    val withH = shingles.select(col(idCol),
      (Text.hash64(col("sh")) % MinhashPrime).as("h31"))
    val sigs = (0 until NumPerms).map { i =>
      min((lit(permA(i)) * col("h31") + lit(permB(i))) % MinhashPrime).as(s"sig_$i")
    }
    withH.groupBy(col(idCol)).agg(sigs.head, sigs.tail: _*)
  }

  /** LSH banding: docs sharing any (band, bandKey) bucket become candidate
    * pairs — the O(n²)-avoiding scale path for near-dup detection.
    */
  def bandPairs(signatures: DataFrame, idCol: String): DataFrame = {
    val nBands = NumPerms / BandRows
    val banded = (0 until nBands).map { b =>
      val key = concat_ws("_",
        (0 until BandRows).map(r => col(s"sig_${b * BandRows + r}")): _*)
      signatures.select(col(idCol), lit(b).as("band"), key.as("band_key"))
    }.reduce(_ unionByName _)
    val l = banded.select(col(idCol).as("da"), col("band"), col("band_key"))
    val r = banded.select(col(idCol).as("db"), col("band"), col("band_key"))
    l.join(r, Seq("band", "band_key")).filter(col("da") < col("db"))
      .select("da", "db").distinct()
  }

  /** SimHash (32-bit): per-token hash bits weighted ±1 and summed per bit
    * position; the fingerprint packs the positive-sum bits. One groupBy with
    * 32 conditional sums — no explosion beyond the token rows.
    */
  def simhash(df: DataFrame, idCol: String, textCol: String,
              bits: Int = 32): DataFrame = {
    val toks = df.select(col(idCol),
      explode(Text.tokens(col(textCol))).as("tok"))
      .withColumn("h", Text.hash64(col("tok")))
    val bitSums = (0 until bits).map { j =>
      sum(shiftright(col("h"), j).bitwiseAND(1) * 2 - 1).as(s"b_$j")
    }
    val packed = (0 until bits).map { j =>
      when(col(s"b_$j") > 0, lit(1L << j)).otherwise(0L)
    }.reduce(_ + _)
    toks.groupBy(col(idCol)).agg(bitSums.head, bitSums.tail: _*)
      .select(col(idCol), packed.as("simhash"))
  }
}
