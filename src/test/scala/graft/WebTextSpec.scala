package graft

import org.apache.spark.sql.functions._

import graft.operators.TextOps

/** HTML extraction, URL canonicalization, and BM25 retrieval — the
  * web-corpus front half of the curation stack, against golden values
  * computed by hand.
  */
class WebTextSpec extends SparkSpec {

  test("htmlExtract strips blocks/tags, decodes entities, measures links") {
    val s = spark
    import s.implicits._
    val html =
      "<html><!-- note --><head><title> T &amp; t </title>" +
        "<style>p{x:1}</style><script>if (1 < 2) { var s = \"</div>\"; }</script>" +
        "</head><body><p>alpha <a href=\"/l?a=1&amp;b=2\">beta</a> " +
        "gamma&nbsp;&lt;tag&gt; &quot;q&#39;</p></body></html>"
    val out = TextOps.htmlExtract(
      Seq((1L, html)).toDF("id", "html"), "id", "html").collect().head
    assert(out.getAs[String]("title") === "T & t")
    assert(out.getAs[Int]("n_links") === 1)
    val text = out.getAs[String]("text")
    assert(text === "alpha beta gamma <tag> \"q'")
    assert(out.getAs[String]("anchor_text") === "beta")
    assert(out.getAs[Int]("n_text_chars") === text.length)
    // 4 anchor chars over 26 text chars
    assert(math.abs(out.getAs[Double]("link_density") - 4.0 / 26) < 1e-5)
  }

  test("htmlExtract: no links, empty text edge") {
    val s = spark
    import s.implicits._
    val rows = TextOps.htmlExtract(
      Seq((1L, "<p>plain</p>"), (2L, "<div></div>")).toDF("id", "html"),
      "id", "html").orderBy("id").collect()
    assert(rows(0).getAs[String]("text") === "plain")
    assert(rows(0).getAs[Int]("n_links") === 0)
    assert(rows(0).getAs[Double]("link_density") === 0.0)
    assert(rows(1).getAs[String]("text") === "")
    assert(rows(1).getAs[Double]("link_density") === 0.0)
  }

  test("urlNormalize canonicalizes case/port/params/fragment") {
    val s = spark
    import s.implicits._
    val urls = Seq(
      (1L, "HTTPS://WWW.Example.COM:443/Path/x?utm_source=a&id=9&ref_=r#frag"),
      (2L, "http://user@Host.Org:8080/a//b/?x=1&gclid=g&y=2"),
      (3L, "https://cdn.net"),
      (4L, "http://localhost:80/p"))
      .toDF("id", "url")
    val out = TextOps.urlNormalize(urls, "id", "url").orderBy("id").collect()
    assert(out(0).getAs[String]("url_norm") === "https://www.example.com/Path/x?id=9")
    assert(out(0).getAs[String]("domain") === "example.com")
    assert(out(0).getAs[Int]("path_depth") === 2)
    assert(out(0).getAs[Int]("n_params") === 3)
    assert(out(0).getAs[Int]("n_params_kept") === 1)
    assert(out(1).getAs[String]("url_norm") === "http://host.org:8080/a//b/?x=1&y=2")
    assert(out(1).getAs[String]("host") === "host.org")
    assert(out(1).getAs[Int]("path_depth") === 2)
    assert(out(2).getAs[String]("url_norm") === "https://cdn.net/")
    assert(out(2).getAs[String]("path") === "/")
    assert(out(2).getAs[Int]("path_depth") === 0)
    // single-label host: domain falls back to the host itself; default port
    assert(out(3).getAs[String]("url_norm") === "http://localhost/p")
    assert(out(3).getAs[String]("domain") === "localhost")
  }

  test("bm25TopK matches the hand-computed Okapi score") {
    val s = spark
    import s.implicits._
    // 3 docs; query term "cat": df=2, N=3; dl = 4, 2, 3; avgdl = 3
    val docs = Seq(
      (1L, "cat cat dog fish"),
      (2L, "dog fish"),
      (3L, "cat bird bird")).toDF("doc_id", "text")
    val queries = Seq((1, "cat")).toDF("query_id", "term")
    val out = TextOps.bm25TopK(docs, "doc_id", "text", queries,
      "query_id", "term", k = 5).orderBy("rank").collect()
    val idf = math.log(1.0 + (3 - 2 + 0.5) / (2 + 0.5))
    def score(tf: Double, dl: Double): Double =
      idf * tf * 2.2 / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / 3.0))
    // doc1: tf=2, dl=4 -> higher than doc3: tf=1, dl=3
    assert(out.map(_.getAs[Long]("doc_id")).toSeq === Seq(1L, 3L))
    assert(math.abs(out(0).getAs[Double]("score") - score(2, 4)) < 1e-5)
    assert(math.abs(out(1).getAs[Double]("score") - score(1, 3)) < 1e-5)
  }

  test("normalizeText: NFC composition, quote/dash folds, control strip") {
    val s = spark
    import s.implicits._
    val messy = "cafe\u0301  \u201Cq\u201D \u2014 x\u200Byz"
    val out = TextOps.normalizeText(
      Seq((1L, messy)).toDF("id", "t"), "id", "t").collect().head
    assert(out.getAs[String]("text_norm") === "caf\u00E9 \"q\" - xyz")
    assert(out.getAs[Int]("n_chars_before") === messy.length)
    assert(out.getAs[Int]("n_chars_after") === 14)
  }

  test("robotsFilter: group tracking, longest match, Allow beats ties") {
    val s = spark
    import s.implicits._
    val robots = Seq(("d.com",
      "User-agent: *\n# c\nDisallow: /a\nAllow: /a/ok\nDisallow: /a/ok\n" +
        "User-agent: bot\nDisallow: /")).toDF("domain", "robots")
    val urls = Seq(
      (1L, "d.com", "/free"),     // no rule matches -> allowed
      (2L, "d.com", "/a/x"),      // Disallow /a -> blocked
      (3L, "d.com", "/a/ok/y"),   // Allow /a/ok ties Disallow /a/ok -> allowed
      (4L, "e.com", "/a/x"))      // no robots for domain -> allowed
      .toDF("id", "domain", "path")
    val got = TextOps.robotsFilter(urls, "id", "domain", "path",
      robots, "domain", "robots")
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Boolean]("allowed")).toMap
    assert(got === Map(1L -> true, 2L -> false, 3L -> true, 4L -> true))
  }

  test("charNgram profiles + out-of-place classification recover the label") {
    val s = spark
    import s.implicits._
    // two synthetic "languages" with disjoint trigram inventories
    val corpus = Seq(
      (1L, "aaa aab aba aaa baa aab", "aa"),
      (2L, "aab aaa aba aab aaa", "aa"),
      (3L, "zzz zzy zyz zzz yzz", "zz"),
      (4L, "zzy zzz zyz yzz zzy", "zz")).toDF("doc_id", "text", "lang")
    val profiles = TextOps.charNgramProfiles(corpus, "lang", "text", n = 3, k = 20)
    // profiles are vocabulary-bounded: at most |langs| * k rows
    assert(profiles.count() <= 40)
    val pred = TextOps.charNgramLangId(corpus, "doc_id", "text", profiles,
      n = 3, k = 20)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("lang_pred"))
      .toMap
    assert(pred === Map(1L -> "aa", 2L -> "aa", 3L -> "zz", 4L -> "zz"))
    // an unseen doc made of 'z' material classifies as the zz language
    val novel = TextOps.charNgramLangId(
      Seq((9L, "zzz yzz zzy")).toDF("doc_id", "text"), "doc_id", "text",
      profiles, n = 3, k = 20).collect().head
    assert(novel.getAs[String]("lang_pred") === "zz")
    // an EMPTY model predicts nothing (the join formulation's behavior:
    // no languages, no distance rows — not a sentinel prediction)
    val noModel = TextOps.charNgramLangId(corpus, "doc_id", "text",
      profiles.filter("1 = 0"), n = 3, k = 20)
    assert(noModel.count() === 0)
  }

  test("phraseSearch counts adjacent occurrences, including overlaps") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (1L, "x a b y a b"),   // two occurrences of "a b"
      (2L, "a x b"),         // terms present but not adjacent
      (3L, "a a a"),         // overlapping "a a": positions 1 and 2
      (4L, "b a")).toDF("doc_id", "text")
    val ab = TextOps.phraseSearch(docs, "doc_id", "text", Seq("a", "b"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(ab === Set((1L, 2L, 2)))
    val aa = TextOps.phraseSearch(docs, "doc_id", "text", Seq("a", "a"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(aa === Set((3L, 2L, 1)))
    // three-term phrase
    val xab = TextOps.phraseSearch(docs, "doc_id", "text", Seq("x", "a", "b"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(xab === Set((1L, 1L, 1)))
  }

  test("readability: Flesch from regexp counts, floors at one sentence") {
    val s = spark
    import s.implicits._
    val rows = TextOps.readability(Seq(
      (1L, "The cat sat. The dog ran!"),  // 6 words, 2 sents, 6 syllables
      (2L, "no terminators here")).toDF("id", "t"), "id", "t")
      .orderBy("id").collect()
    assert(rows(0).getAs[Int]("n_words") === 6)
    assert(rows(0).getAs[Int]("n_sents") === 2)
    assert(rows(0).getAs[Int]("n_syllables") === 6)
    val expected = 206.835 - 1.015 * (6.0 / 2) - 84.6 * (6.0 / 6)
    assert(math.abs(rows(0).getAs[Double]("flesch") - expected) < 1e-3)
    assert(rows(1).getAs[Int]("n_sents") === 1) // floored
  }

  test("jaroWinkler matches the textbook values") {
    import graft.functions.StringSim._
    assert(math.abs(jaroWinkler("MARTHA", "MARHTA") - 0.9611111111111111) < 1e-12)
    assert(math.abs(jaroWinkler("DWAYNE", "DUANE") - 0.84) < 1e-12)
    assert(math.abs(jaroWinkler("DIXON", "DICKSONX") - 0.8133333333333332) < 1e-12)
    assert(jaroWinkler("abc", "abc") === 1.0)
    assert(jaroWinkler("abc", "xyz") === 0.0)
    assert(jaroWinkler("", "abc") === 0.0)
    // below the 0.7 boost threshold the prefix bonus must NOT apply
    assert(jaroWinkler("aaxxxxxx", "aayyyyyy") === jaro("aaxxxxxx", "aayyyyyy"))
  }

  test("bm25TopK rank ties break by doc id; k truncates") {
    val s = spark
    import s.implicits._
    val docs = Seq((10L, "x y"), (11L, "x y"), (12L, "x y")).toDF("doc_id", "text")
    val queries = Seq((1, "x")).toDF("query_id", "term")
    val out = TextOps.bm25TopK(docs, "doc_id", "text", queries,
      "query_id", "term", k = 2).orderBy("rank").collect()
    assert(out.map(_.getAs[Long]("doc_id")).toSeq === Seq(10L, 11L))
  }
}
