package graft

import java.net.InetSocketAddress
import java.util.concurrent.atomic.AtomicInteger

import com.sun.net.httpserver.HttpServer

import graft.sources.{AhmedMlSource, FetchCache, Fetchers, HfFetcher, HttpFetcher, LocalFetcher}

/** The dataset-fetch seam: local pass-through (what every oracle query
  * uses), the HTTP staging backend against a loopback server (real
  * network code, no egress), the hf:// URI rewrite, and registry
  * swap-in — the reference's remote layer (`era5.py:103`,
  * `ahmedml.py:284-312`) as a one-class plug.
  */
class FetcherSpec extends SparkSpec {

  test("local roots pass through unchanged; missing roots fail loudly") {
    val dir = java.nio.file.Files.createTempDirectory("fetch_local").toString
    assert(Fetchers.resolve(spark, dir) == dir)
    // globbed roots pass through for scan-time expansion — including the
    // Hadoop single-char '?' wildcard
    assert(Fetchers.resolve(spark, s"$dir/run_*") == s"$dir/run_*")
    assert(Fetchers.resolve(spark, s"$dir/run_?") == s"$dir/run_?")
    intercept[IllegalArgumentException](
      Fetchers.resolve(spark, "/no/such/dataset/root"))
  }

  test("unknown schemes name the registered backends in the error") {
    val e = intercept[IllegalArgumentException](
      Fetchers.resolve(spark, "cds://era5/whatever"))
    assert(e.getMessage.contains("cds") && e.getMessage.contains("https"),
      e.getMessage)
  }

  test("hf:// dataset URIs rewrite to the public resolve/main HTTPS form") {
    val hf = new HfFetcher(new HttpFetcher)
    assert(hf.toHttps("hf://datasets/org/repo/run_1/volume_1.vtu") ==
      "https://huggingface.co/datasets/org/repo/resolve/main/run_1/volume_1.vtu")
    intercept[IllegalArgumentException](hf.toHttps("hf://models/x/y"))
  }

  test("HTTP backend stages a manifest once (cached), and a staged " +
    "AhmedML run layout reads through the ordinary source path") {
    val hits = new AtomicInteger(0)
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    val files = Map(
      "/data/run_0/force_mom_0.csv" -> "cd,lift-z\n0.25,1.5\n",
      "/data/run_1/force_mom_1.csv" -> "cd,lift-z\n0.5,2.5\n")
    server.createContext("/", { ex =>
      hits.incrementAndGet()
      files.get(ex.getRequestURI.getPath) match {
        case Some(body) =>
          val b = body.getBytes("UTF-8")
          ex.sendResponseHeaders(200, b.length)
          ex.getResponseBody.write(b)
        case None => ex.sendResponseHeaders(404, -1)
      }
      ex.close()
    })
    server.start()
    try {
      val base = s"http://127.0.0.1:${server.getAddress.getPort}/data"
      val http = new HttpFetcher
      val manifest = Seq(
        (s"$base/run_0/force_mom_0.csv", "run_0/force_mom_0.csv"),
        (s"$base/run_1/force_mom_1.csv", "run_1/force_mom_1.csv"))
      val root = http.stage(manifest)
      val got = AhmedMlSource.readGlobalData(spark, root)
        .collect().map(r => (r.getLong(0), r.getString(1), r.getFloat(2)))
        .toSet
      assert(got == Set((0L, "cd", 0.25f), (0L, "lift_z", 1.5f),
        (1L, "cd", 0.5f), (1L, "lift_z", 2.5f)), got.toString)
      val firstHits = hits.get()
      assert(firstHits == 2, s"expected 2 downloads, saw $firstHits")
      // identical manifest re-stages from cache: zero new requests
      assert(http.stage(manifest) == root)
      assert(hits.get() == firstHits, "cache miss on identical manifest")
      // path traversal in a manifest is rejected
      intercept[IllegalArgumentException](
        http.stage(Seq((s"$base/x", "../escape"))))
      // single-object resolve stages and returns the staged file
      val one = http.resolve(spark, s"$base/run_0/force_mom_0.csv")
      assert(new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(one)), "UTF-8") == files("/data/run_0/force_mom_0.csv"))
      // a 404 fails loudly
      intercept[IllegalArgumentException](
        http.fetch(spark, s"$base/missing"))
    } finally server.stop(0)
  }

  test("checksummed staging: verify on download, re-verify cache hits, " +
    "re-fetch corrupted files, refuse corrupt servers") {
    val hits = new AtomicInteger(0)
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    // unique content per test run: the cache key is the CONTENT digest for
    // fully-checksummed manifests, so a fixed body would hit the staged
    // root left by a previous suite run and the download-count assertions
    // would start warm
    val body = s"cd,lift-z,run\n0.75,3.5,${java.util.UUID.randomUUID()}\n"
    server.createContext("/", { ex =>
      hits.incrementAndGet()
      val b = body.getBytes("UTF-8")
      ex.sendResponseHeaders(200, b.length)
      ex.getResponseBody.write(b)
      ex.close()
    })
    server.start()
    try {
      val base = s"http://127.0.0.1:${server.getAddress.getPort}"
      val http = new HttpFetcher
      val goodSum = java.security.MessageDigest.getInstance("SHA-256")
        .digest(body.getBytes("UTF-8")).map(b => f"$b%02x").mkString
      val manifest = Seq((s"$base/csum/a.csv", "csum/a.csv"))
      val sums = Map("csum/a.csv" -> goodSum)
      val root = http.stage(manifest, sums)
      val target = java.nio.file.Paths.get(root, "csum", "a.csv")
      assert(new String(java.nio.file.Files.readAllBytes(target), "UTF-8") == body)
      assert(hits.get() == 1)
      // verified cache hit: re-staging re-checks bytes, no new request
      assert(http.stage(manifest, sums) == root)
      assert(hits.get() == 1, "verified cache hit must not re-download")
      // corrupt the staged file: the checksum catches it and re-fetches
      java.nio.file.Files.write(target, "tampered".getBytes("UTF-8"))
      assert(http.stage(manifest, sums) == root)
      assert(hits.get() == 2, "corrupted staged file must re-fetch")
      assert(new String(java.nio.file.Files.readAllBytes(target), "UTF-8") == body,
        "re-fetch must repair the staged bytes")
      // a server returning bytes that don't match the declared digest
      // fails loudly and does not poison the cache
      val badManifest = Seq((s"$base/csum/b.csv", "csum/b.csv"))
      val e = intercept[IllegalArgumentException](
        http.stage(badManifest, Map("csum/b.csv" -> ("0" * 64))))
      assert(e.getMessage.contains("checksum mismatch"), e.getMessage)
      assert(!java.nio.file.Files.exists(
        java.nio.file.Paths.get(http.stage(badManifest), "nonexistent")))
    } finally server.stop(0)
  }

  test("fetch-cache maintenance: list, LRU touch on hit, remove-older-than, evict-to-budget") {
    import java.nio.file.{Files => NF, Paths => NP}
    // isolated cache root (suites run in parallel; never mutate the shared
    // JVM-wide graft_fetch cache from a maintenance test) + offline fetcher
    val cacheRoot = NF.createTempDirectory("graft_fetch_evict")
    val http = new HttpFetcher(cacheRoot) {
      override protected def get(uri: String): Array[Byte] =
        s"body of $uri padded ${"x" * 64}".getBytes("UTF-8")
    }
    val r1 = http.stage(Seq(("http://t.invalid/a.bin", "a.bin")))
    val r2 = http.stage(Seq(("http://t.invalid/b.bin", "b.bin")))
    val k1 = NP.get(r1).getFileName.toString
    val k2 = NP.get(r2).getFileName.toString
    val l0 = FetchCache.list(cacheRoot)
    assert(l0.map(_.key).toSet == Set(k1, k2))
    assert(l0.forall(e => e.sizeBytes > 0 && e.nFiles == 2)) // file + marker
    assert(FetchCache.totalSizeBytes(cacheRoot) == l0.map(_.sizeBytes).sum)
    // LRU: backdate k1's marker, then a cache HIT must refresh last-use
    val m1 = NP.get(r1, "_STAGED")
    val old = System.currentTimeMillis() - 600000L
    NF.setLastModifiedTime(m1,
      java.nio.file.attribute.FileTime.fromMillis(old))
    assert(FetchCache.list(cacheRoot).find(_.key == k1).get.lastUsedMs == old)
    http.stage(Seq(("http://t.invalid/a.bin", "a.bin"))) // hit, no refetch
    assert(FetchCache.list(cacheRoot).find(_.key == k1).get.lastUsedMs > old)
    // remove-older-than: backdate k1 again; only it falls past the cutoff
    NF.setLastModifiedTime(m1,
      java.nio.file.attribute.FileTime.fromMillis(old))
    assert(FetchCache.removeOlderThan(
      System.currentTimeMillis() - 300000L, cacheRoot) == 1)
    assert(FetchCache.list(cacheRoot).map(_.key) == Seq(k2))
    // a removed entry is simply re-fetched on next use
    val r1b = http.stage(Seq(("http://t.invalid/a.bin", "a.bin")))
    assert(r1b == r1 && NF.exists(NP.get(r1b, "a.bin")))
    // evict-to-budget drops oldest-used first until under the cap
    assert(FetchCache.evictToSize(1L, cacheRoot) == 2)
    assert(FetchCache.totalSizeBytes(cacheRoot) == 0L)
    // exact-key removal on a rebuilt entry
    http.stage(Seq(("http://t.invalid/b.bin", "b.bin")))
    assert(FetchCache.remove(Seq(k2), cacheRoot) == 1)
    assert(FetchCache.list(cacheRoot).isEmpty)
  }

  test("registry swap-in: a custom backend serves its scheme") {
    val dir = java.nio.file.Files.createTempDirectory("fetch_mock").toString
    Fetchers.register(new graft.sources.Fetcher {
      override val schemes = Seq("mock")
      override def resolve(s: org.apache.spark.sql.SparkSession, uri: String) =
        dir + "/" + uri.stripPrefix("mock://")
      override def fetch(s: org.apache.spark.sql.SparkSession, uri: String) =
        LocalFetcher.fetch(s, resolve(s, uri))
    })
    assert(Fetchers.resolve(spark, "mock://sub/path") == s"$dir/sub/path")
  }
}
