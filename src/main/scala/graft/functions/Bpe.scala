package graft.functions

import scala.collection.mutable

/** Byte-pair-encoding tokenizer (Sennrich et al. 2016, public): a real
  * merges-table BPE — training learns a ranked list of symbol-pair merges
  * from a word-frequency vocabulary, and encoding applies them by iterative
  * lowest-rank merging. This replaces the pre-tokenizer *pattern count*
  * ([[Text.bpeTokenCount]]) wherever an operator budgets actual tokenizer
  * tokens (token-budget selection, sequence packing, chunking).
  *
  * Determinism contract (what makes the DuckDB oracle possible):
  *  - training tie-breaks equal pair counts by the lexicographically
  *    smallest pair, so the merges table is a pure function of the
  *    vocabulary;
  *  - encoding merges the LEFTMOST occurrence of the LOWEST-RANK adjacent
  *    pair, one merge per step. One-at-a-time leftmost merging is provably
  *    equivalent to the classic "merge all occurrences of the best pair"
  *    formulation: any pair involving a token produced by merge rank r was
  *    learned after r, so its rank is > r and cannot preempt the remaining
  *    occurrences of rank r. The oracle mirrors exactly this step function
  *    as a recursive CTE over the materialized merges table.
  *
  * Scale shape: training is driver-side over the *distinct pre-token
  * vocabulary with counts* (vocabulary-bounded, the same bound as the
  * unigram-LM vocab aggregate — real tokenizers are trained offline on a
  * sample for the same reason); encoding is distributed, one typed
  * mapPartitions with a per-partition word→tokens cache (vocabulary-bounded
  * memory, so repeated words cost one hash probe, not a re-merge).
  */
object Bpe {

  private val Re = java.util.regex.Pattern.compile(Text.BpePattern)

  /** Pre-tokenize: letter runs, digit runs, single punctuation — the same
    * pattern the column-level [[Text.bpeTokenCount]] counts, evaluated with
    * java.util.regex here (identical match semantics to RE2 on this
    * alternation; both engines see Unicode categories).
    */
  def pretokens(text: String): Array[String] = {
    val m = Re.matcher(text)
    val out = Array.newBuilder[String]
    while (m.find()) out += m.group()
    out.result()
  }

  /** Train `numMerges` merges from a (word, count) vocabulary. Classic BPE:
    * each round counts adjacent symbol pairs weighted by word frequency and
    * merges the most frequent (ties → lexicographically smallest pair).
    * Driver-side and vocabulary-bounded by design; returns fewer merges if
    * the vocabulary saturates first.
    */
  def train(vocab: Seq[(String, Long)], numMerges: Int): Seq[(String, String)] = {
    require(numMerges >= 0, s"numMerges $numMerges must be non-negative")
    var words: mutable.Map[Vector[String], Long] = {
      val m = mutable.HashMap.empty[Vector[String], Long]
      vocab.foreach { case (w, c) =>
        if (w.nonEmpty) {
          val k = w.map(_.toString).toVector
          m.update(k, m.getOrElse(k, 0L) + c)
        }
      }
      m
    }
    val merges = Seq.newBuilder[(String, String)]
    var round = 0
    var exhausted = false
    while (round < numMerges && !exhausted) {
      val pairCounts = mutable.HashMap.empty[(String, String), Long]
      words.foreach { case (syms, c) =>
        var i = 0
        while (i < syms.length - 1) {
          val p = (syms(i), syms(i + 1))
          pairCounts.update(p, pairCounts.getOrElse(p, 0L) + c)
          i += 1
        }
      }
      if (pairCounts.isEmpty) exhausted = true
      else {
        // max count, tie-break lexicographically smallest pair — total order
        val best = pairCounts.iterator.reduce { (a, b) =>
          if (a._2 != b._2) { if (a._2 > b._2) a else b }
          else if (Ordering[(String, String)].lt(a._1, b._1)) a else b
        }._1
        merges += best
        val next = mutable.HashMap.empty[Vector[String], Long]
        words.foreach { case (syms, c) =>
          val out = Vector.newBuilder[String]
          var i = 0
          while (i < syms.length) {
            if (i < syms.length - 1 && syms(i) == best._1 && syms(i + 1) == best._2) {
              out += syms(i) + syms(i + 1); i += 2
            } else { out += syms(i); i += 1 }
          }
          val k = out.result()
          next.update(k, next.getOrElse(k, 0L) + c)
        }
        words = next
        round += 1
      }
    }
    merges.result()
  }

  /** Encode one pre-token: start from characters, repeatedly merge the
    * leftmost occurrence of the lowest-rank adjacent pair until no adjacent
    * pair is in the table. (Surrogate-pair caveat: symbols start as UTF-16
    * chars; for the BMP text this engine targets that equals code points.)
    */
  def encode(word: String, ranks: Map[(String, String), Int]): Array[String] = {
    var syms = word.map(_.toString).toArray
    var done = syms.length < 2
    while (!done) {
      var bestRank = Int.MaxValue
      var bestI = -1
      var i = 0
      while (i < syms.length - 1) {
        ranks.get((syms(i), syms(i + 1))) match {
          case Some(r) if r < bestRank => bestRank = r; bestI = i
          case _ =>
        }
        i += 1
      }
      if (bestI < 0) done = true
      else {
        val merged = new Array[String](syms.length - 1)
        System.arraycopy(syms, 0, merged, 0, bestI)
        merged(bestI) = syms(bestI) + syms(bestI + 1)
        System.arraycopy(syms, bestI + 2, merged, bestI + 1, syms.length - bestI - 2)
        syms = merged
        done = syms.length < 2
      }
    }
    syms
  }
}
