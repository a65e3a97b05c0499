package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.functions.Bpe
import graft.operators.TextOps

/** Merges-table BPE: training determinism, the one-at-a-time-leftmost vs
  * all-occurrences merge equivalence the oracle relies on, and the
  * distributed encode.
  */
class BpeSpec extends SparkSpec {

  private def check(p: Prop, n: Int = 200): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(n), p)
    assert(res.passed, res.status.toString)
  }

  /** Classic formulation: each step merges ALL non-overlapping occurrences
    * (leftmost-first) of the single lowest-rank pair present. The recursive
    * oracle and [[Bpe.encode]] merge one occurrence per step instead; this
    * reference pins their equivalence.
    */
  private def encodeAllAtOnce(word: String, ranks: Map[(String, String), Int]): Vector[String] = {
    var syms = word.map(_.toString).toVector
    var done = false
    while (!done) {
      val present = syms.zip(syms.drop(1)).flatMap(p => ranks.get(p).map(p -> _))
      if (present.isEmpty) done = true
      else {
        val best = present.minBy(_._2)._1
        val out = Vector.newBuilder[String]
        var i = 0
        while (i < syms.length) {
          if (i < syms.length - 1 && syms(i) == best._1 && syms(i + 1) == best._2) {
            out += syms(i) + syms(i + 1); i += 2
          } else { out += syms(i); i += 1 }
        }
        syms = out.result()
      }
    }
    syms
  }

  test("train is deterministic and ranks compose: trained merges re-encode the corpus") {
    val vocab = Seq("lower" -> 5L, "lowest" -> 2L, "newer" -> 6L, "wider" -> 3L)
    val m1 = Bpe.train(vocab, 10)
    val m2 = Bpe.train(vocab.reverse, 10)
    assert(m1 == m2, "training must not depend on vocabulary order")
    assert(m1.length == 10)
    // the highest-count pair ('e','r': 5+6+3=14 occurrences) merges first
    assert(m1.head == ("e", "r"))
  }

  test("train stops when the vocabulary saturates") {
    val m = Bpe.train(Seq("ab" -> 3L), 10)
    assert(m == Seq(("a", "b")))
  }

  test("encode: concatenating tokens always rebuilds the word; no-merge words stay chars") {
    val ranks = Bpe.train(Seq("banana" -> 4L, "bandana" -> 2L), 6).zipWithIndex.toMap
    for (w <- Seq("banana", "bandana", "ban", "xyzzy", "", "a")) {
      val toks = Bpe.encode(w, ranks)
      assert(toks.mkString == w, s"round-trip failed for '$w'")
    }
    assert(Bpe.encode("xyzzy", ranks).toSeq == Seq("x", "y", "z", "z", "y"))
  }

  test("property: one-at-a-time leftmost merging == classic all-occurrences merging") {
    val letters = Gen.listOf(Gen.oneOf('a', 'b', 'c', 'd')).map(_.mkString)
    val vocabGen = Gen.nonEmptyListOf(
      Gen.zip(Gen.nonEmptyListOf(Gen.oneOf('a', 'b', 'c', 'd')).map(_.mkString),
        Gen.choose(1L, 9L)))
    check(Prop.forAll(vocabGen, letters, Gen.choose(0, 12)) { (vocab, word, nm) =>
      val ranks = Bpe.train(vocab, nm).zipWithIndex.toMap
      Bpe.encode(word, ranks).toVector == encodeAllAtOnce(word, ranks)
    })
  }

  test("pretokens matches the column-level pattern count") {
    val s = spark
    import s.implicits._
    val texts = Seq("hello world 42!", "a-b c,d", "", "  spaced   out  ", "§ mixed 7x")
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
    val colCounts = df.select(col("id"),
      graft.functions.Text.bpeTokenCount(col("text")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    texts.zipWithIndex.foreach { case (t, i) =>
      assert(Bpe.pretokens(t).length == colCounts(i.toLong), s"mismatch on '$t'")
    }
  }

  test("bpeEncode: distributed counts and stream agree with a driver-side encode") {
    val s = spark
    import s.implicits._
    val df = Seq((1L, "low lower lowest"), (2L, "new newer news"), (3L, ""))
      .toDF("doc_id", "text")
    val merges = TextOps.trainBpe(df, "text", 8)
    val ranks = merges.zipWithIndex.toMap
    val got = TextOps.bpeEncode(df, "doc_id", "text", merges)
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getSeq[String](3))))
      .toMap
    for ((id, text) <- Seq(1L -> "low lower lowest", 2L -> "new newer news", 3L -> "")) {
      val pts = Bpe.pretokens(text)
      val toks = pts.flatMap(Bpe.encode(_, ranks)).toSeq
      assert(got(id) == ((pts.length.toLong, toks.length.toLong, toks)), s"doc $id")
    }
  }

  test("vocab ids round-trip: decode(toIds(encode)) reconstructs the pre-token concat") {
    val s = spark
    import s.implicits._
    val texts = Seq(1L -> "low lower lowest", 2L -> "new newer news!", 3L -> "")
    val df = texts.toDF("doc_id", "text")
    val merges = TextOps.trainBpe(df, "text", 8)
    val enc = TextOps.bpeEncode(df, "doc_id", "text", merges)
    val vocab = TextOps.bpeVocab(enc)
    // ids are the lexicographic rank of the distinct tokens
    val v = vocab.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(v.keys.toSeq.sorted.zipWithIndex.forall { case (t, i) => v(t) == i.toLong })
    val ids = TextOps.bpeToIds(enc, "doc_id", vocab)
    val dec = TextOps.bpeDecode(ids, "doc_id", vocab)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    texts.foreach { case (id, t) =>
      val want = Bpe.pretokens(t).mkString("")
      if (want.isEmpty) assert(!dec.contains(id)) // no tokens -> no row
      else assert(dec(id) == want, s"doc $id")
    }
  }

  test("unigramEncode: Viterbi picks the max-score segmentation, min-pieces tie-break") {
    val s = spark
    import s.implicits._
    import graft.operators.TextOps
    // hand vocab: "abc" dominates; "xy"+"z" and "x"+"yz" tie on score
    // (7+3 = 3+7) and on pieces — but "xyz" itself scores 9 with ONE piece
    // only if present; drop it so the tie resolves by equal (score, np)
    val vocab = Seq(("a", 10L), ("b", 1L), ("c", 1L), ("ab", 20L),
      ("bc", 5L), ("abc", 50L), ("x", 3L), ("y", 1L), ("z", 3L),
      ("xy", 7L), ("yz", 7L))
    val docs = Seq((1L, "abc abab"), (2L, "xyz"), (3L, "")).toDF("id", "text")
    val got = TextOps.unigramEncode(docs, "id", "text", vocab)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    // "abc" → 50/1; "abab" → ab|ab = 40/2 (beats a|b|ab = 31/3)
    assert(got(1L) == ((2L, 90L, 3L)), got.toString)
    // "xyz": xy|z = 10/2 == x|yz = 10/2 — unique (score, np) despite two
    // optimal paths
    assert(got(2L) == ((1L, 10L, 2L)), got.toString)
    assert(got(3L) == ((0L, 0L, 0L)))
    // uncoverable word fails loudly rather than silently skipping
    intercept[org.apache.spark.SparkException] {
      TextOps.unigramEncode(Seq((9L, "aq")).toDF("id", "text"),
        "id", "text", vocab).collect()
    }
  }

  test("wordpieceEncode: greedy longest match, ## continuation, whole-word UNK") {
    val s = spark
    import s.implicits._
    import graft.operators.TextOps
    val vocab = Set("un", "##aff", "##able", "##a", "##f", "##l", "##e",
      "##b", "u", "##n", "x", "##y")
    // "unaffable" → un ##aff ##able = 3 pieces (longest-first at each step)
    // "xy" → x ##y = 2; "unz" → no ##z anywhere → whole word UNK (1 piece)
    val docs = Seq((1L, "unaffable xy"), (2L, "unz unaffable")).toDF("id", "text")
    val got = TextOps.wordpieceEncode(docs, "id", "text", vocab)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got(1L) == ((2L, 5L, 0L)), got.toString)
    assert(got(2L) == ((2L, 4L, 1L)), got.toString)
  }

  test("wordpieceVocab: position-classed n-grams") {
    val s = spark
    import s.implicits._
    import graft.operators.TextOps
    val v = TextOps.wordpieceVocab(Seq("ab ab ba").toDF("text"), "text")
    assert(v == Set("a", "b", "ab", "ba", "##a", "##b"), v.toString)
  }

  test("wordpieceVocab: minFreq cutoff bounds the candidate set; " +
    "minFreq=1 is identical to the uncut census") {
    val s = spark
    import s.implicits._
    import graft.operators.TextOps
    val docs = Seq("ab ab ba").toDF("text")
    // explicit minFreq=1 ≡ default ≡ the uncut candidate census
    assert(TextOps.wordpieceVocab(docs, "text", maxN = 4, minFreq = 1L) ==
      TextOps.wordpieceVocab(docs, "text"))
    // piece frequencies (word "ab"×2, "ba"×1): a:2, ab:2, ##b:2 from
    // "ab"; b:1, ba:1, ##a:1 from "ba" — the floor keeps only the ≥2s
    val cut = TextOps.wordpieceVocab(docs, "text", maxN = 4, minFreq = 2L)
    assert(cut == Set("a", "ab", "##b"), cut.toString)
    // on a fixture where every candidate clears the floor, cut ≡ uncut
    val dense = Seq("xy xy", "xy yx yx").toDF("text")
    assert(TextOps.wordpieceVocab(dense, "text", maxN = 2, minFreq = 2L) ==
      TextOps.wordpieceVocab(dense, "text", maxN = 2), "cutoff != uncut")
  }

  test("unigramVocab: n-gram census over DISTINCT words with integer scores") {
    val s = spark
    import s.implicits._
    import graft.operators.TextOps
    // "aa aa ab": distinct words {aa, ab}; 1-grams: a×3, b×1; 2-grams:
    // aa×1, ab×1 → scores: a: 1+ilog2(3)=2, b: 1+0=1, aa: 4+0=4, ab: 4
    val v = TextOps.unigramVocab(Seq("aa aa ab").toDF("text"), "text").toMap
    assert(v == Map("a" -> 2L, "b" -> 1L, "aa" -> 4L, "ab" -> 4L), v.toString)
  }

  test("unigramVocab minFreq: distributed cutoff, single-char pieces immune") {
    val s = spark
    import s.implicits._
    import graft.operators.TextOps
    val docs = Seq("aa aa ab").toDF("text")
    // minFreq = 1 IS the uncut census
    assert(TextOps.unigramVocab(docs, "text", maxN = 4, minFreq = 1L) ==
      TextOps.unigramVocab(docs, "text"))
    // distinct words {aa, ab} → piece counts a:3, b:1, aa:1, ab:1; the
    // ≥2 floor drops both rare 2-grams but 1-grams stay (SentencePiece's
    // character-coverage rule keeps Viterbi total under any cutoff)
    val cut = TextOps.unigramVocab(docs, "text", maxN = 4, minFreq = 2L).toMap
    assert(cut == Map("a" -> 2L, "b" -> 1L), cut.toString)
    // a fixture where every piece clears the floor (2-grams ab, bc each
    // appear in two distinct words): cut ≡ uncut
    val dense = Seq("ab abc bc").toDF("text")
    assert(TextOps.unigramVocab(dense, "text", maxN = 2, minFreq = 2L) ==
      TextOps.unigramVocab(dense, "text", maxN = 2), "cutoff != uncut")
  }
}
