package graft.sources

import java.net.URI
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths}
import java.security.MessageDigest

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.SparkSession

/** Dataset-fetch seam — the fsspec analogue behind every remote-backed
  * source. The reference actually downloads its datasets: ERA5 from the
  * ARCO/WB2/NCAR/CDS backend registry (`domains/da/sources/era5.py:
  * 103-382`), GFS/HRRR from AWS open data (`gfs.py:81`, `hrrr.py:82`),
  * AhmedML/DrivAerML from HuggingFace via fsspec (`ahmedml.py:284-312`,
  * `drivaerml.py:79`). This repo implements the full LOCAL contract of
  * each source (routing, lexicons, layout, assembly); the network layer
  * is this one-trait plug: a [[Fetcher]] turns a dataset URI into a
  * Hadoop-scannable root, staging bytes when the scheme isn't directly
  * scannable.
  *
  * Registered backends:
  *  - no scheme / `file:` — [[LocalFetcher]], an existence-checked
  *    pass-through (what every green test query uses today).
  *  - `hdfs: s3a: gs: abfs: wasbs: o3fs:` — [[HadoopFetcher]]: Hadoop
  *    FileSystem already federates these; pass through untouched so the
  *    DataFrame readers scan them DISTRIBUTED (staging 100 TB through a
  *    driver-side download would be the anti-pattern — the scan must go
  *    to the executors, not the bytes to the driver).
  *  - `http: https:` — [[HttpFetcher]]: stages a bounded MANIFEST of
  *    objects (HTTP has no native listing) into a content-addressed
  *    local cache and returns the staged root. This is the
  *    metadata/fixture path (CSV globals, grib indexes, small runs),
  *    never the bulk-data path.
  *  - `hf:` — HuggingFace dataset URIs `hf://datasets/<org>/<repo>/<path>`
  *    rewritten to their public `resolve/main` HTTPS form and delegated
  *    to the HTTP backend — fsspec's `hf://` protocol, as used by
  *    `ahmedml.py:284`.
  *
  * `Fetchers.register` swaps or extends backends at runtime (an
  * authenticated CDS client, a mocked test server), which is the whole
  * point of the seam: when this code runs outside the zero-egress
  * sandbox nothing in the sources changes — only a registry entry.
  */
trait Fetcher {
  /** URI schemes this backend serves, lower-case. */
  def schemes: Seq[String]

  /** Resolve a dataset root URI to a Hadoop-scannable path. */
  def resolve(spark: SparkSession, uri: String): String

  /** Fetch one object's bytes (metadata-sized; bulk data must scan). */
  def fetch(spark: SparkSession, uri: String): Array[Byte]
}

/** Existence-checked pass-through for local paths. */
object LocalFetcher extends Fetcher {
  override val schemes: Seq[String] = Seq("", "file")

  override def resolve(spark: SparkSession, uri: String): String = {
    // globbed roots pass through (the glob expands at scan time);
    // '?' is a Hadoop single-char wildcard too
    if (uri.exists(c => c == '*' || c == '[' || c == '{' || c == '?')) return uri
    val p = new org.apache.hadoop.fs.Path(uri)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(fs.exists(p), s"no such dataset root: $uri")
    uri
  }

  override def fetch(spark: SparkSession, uri: String): Array[Byte] = {
    val p = new org.apache.hadoop.fs.Path(uri)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val in = fs.open(p)
    try {
      val len = fs.getFileStatus(p).getLen
      require(len <= Int.MaxValue, s"$uri too large for a single fetch")
      val buf = new Array[Byte](len.toInt)
      in.readFully(0, buf)
      buf
    } finally in.close()
  }
}

/** Pass-through for schemes Hadoop FileSystem federates (s3a, gs, abfs…):
  * the scan stays distributed; no driver-side staging.
  */
object HadoopFetcher extends Fetcher {
  override val schemes: Seq[String] =
    Seq("hdfs", "s3a", "gs", "abfs", "abfss", "wasb", "wasbs", "o3fs")
  override def resolve(spark: SparkSession, uri: String): String = uri
  override def fetch(spark: SparkSession, uri: String): Array[Byte] =
    LocalFetcher.fetch(spark, uri) // same FileSystem API, other impl
}

/** HTTP(S) staging backend: GET each manifest entry once into a
  * content-addressed cache under `java.io.tmpdir`, preserving relative
  * layout, and return the staged root. A bare `resolve(url)` stages the
  * single object. Re-resolving an already-staged manifest is a no-op
  * (cache key = digest of the sorted manifest), which is the reference's
  * skip-if-downloaded behavior (`ahmedml.py:296-303`).
  */
class HttpFetcher(cacheDir: Path = FetchCache.root) extends Fetcher {
  override val schemes: Seq[String] = Seq("http", "https")

  // One client per fetcher (thread-safe, connection-pooling): building a
  // client per GET re-did TLS/executor setup for every manifest object.
  @transient private lazy val client: java.net.http.HttpClient =
    java.net.http.HttpClient.newBuilder()
      .followRedirects(java.net.http.HttpClient.Redirect.NORMAL)
      .build()

  protected def get(uri: String): Array[Byte] = {
    val req = java.net.http.HttpRequest.newBuilder(URI.create(uri)).GET()
      .build()
    val resp = client.send(req,
      java.net.http.HttpResponse.BodyHandlers.ofByteArray())
    require(resp.statusCode() / 100 == 2,
      s"GET $uri failed: HTTP ${resp.statusCode()}")
    resp.body()
  }

  override def fetch(spark: SparkSession, uri: String): Array[Byte] =
    get(uri)

  private def cacheRoot(key: String): Path = cacheDir.resolve(key)

  private def digest(s: String): String =
    MessageDigest.getInstance("SHA-256")
      .digest(s.getBytes(StandardCharsets.UTF_8))
      .take(12).map(b => f"$b%02x").mkString

  private def sha256Hex(bytes: Array[Byte]): String =
    MessageDigest.getInstance("SHA-256").digest(bytes)
      .map(b => f"$b%02x").mkString

  /** Stage `(uri, relativePath)` entries under one cached root.
    *
    * `checksums` maps relative paths to expected SHA-256 hex digests
    * (the reference validates its downloads the same way —
    * `ahmedml.py:296-303` skips only verified-complete files). For
    * checksummed entries a cache hit re-verifies the staged bytes and a
    * corrupted file is re-fetched; a download whose bytes do not match
    * the declared digest fails loudly (server-side corruption must not
    * be cached as truth). Entries without a checksum keep the cheap
    * skip-if-staged behavior.
    */
  def stage(manifest: Seq[(String, String)],
            checksums: Map[String, String] = Map.empty): String = {
    require(manifest.nonEmpty, "empty fetch manifest")
    manifest.foreach { case (_, rel) =>
      require(!rel.startsWith("/") && !rel.split('/').contains(".."),
        s"manifest path escapes the staging root: $rel")
    }
    // Content-keyed when every entry is checksummed: the key digests the
    // sorted (relative path, sha256) pairs -- CONTENT identity, not URI
    // identity -- so mirrors, re-minted ephemeral ports (loopback test
    // servers), and renamed hosts hit the same staged root instead of
    // accreting one never-evicted copy per URI spelling. Unchecksummed
    // manifests fall back to the URI-keyed digest (the URI is all that
    // identifies them).
    val key =
      if (manifest.forall { case (_, rel) => checksums.contains(rel) })
        digest(manifest.map(_._2).sorted
          .map(rel => rel + "\u0000" +
            checksums(rel).toLowerCase(java.util.Locale.ROOT))
          .mkString("\n"))
      else digest(manifest.sorted.map(e => e._1 + "\u0000" + e._2)
        .mkString("\n"))
    val root = cacheRoot(key)
    val done = root.resolve("_STAGED")
    val allStaged = Files.exists(done)
    // Objects are independent (disjoint relative paths, enforced above) —
    // stage them from a small pool so per-object GET/verify/write latency
    // overlaps (guide §2.6 applied to the driver-side transport; measured
    // on the loopback fetch fixtures). Failure semantics unchanged: every
    // task is awaited and the first failure (e.g. a checksum mismatch)
    // rethrows after the pool drains, so no partial download is left
    // in flight.
    val pool = java.util.concurrent.Executors.newFixedThreadPool(
      math.min(4, math.max(1, manifest.size)))
    val tasks = manifest.map { case (uri, rel) =>
      pool.submit(new java.util.concurrent.Callable[Unit] {
        override def call(): Unit = {
          val target = root.resolve(rel)
          val expect = checksums.get(rel).map(_.toLowerCase(java.util.Locale.ROOT))
          val cachedOk =
            if (!Files.exists(target)) false
            else expect match {
              case Some(h) => sha256Hex(Files.readAllBytes(target)) == h
              case None    => allStaged
            }
          if (!cachedOk) {
            val bytes = get(uri)
            expect.foreach { h =>
              val got = sha256Hex(bytes)
              require(got == h,
                s"checksum mismatch for $uri: expected sha256 $h, got $got — " +
                  "refusing to cache corrupt bytes")
            }
            Files.createDirectories(target.getParent)
            Files.write(target, bytes)
          }
        }
      })
    }
    try {
      var failure: Throwable = null
      tasks.foreach { t =>
        try t.get()
        catch {
          case e: java.util.concurrent.ExecutionException =>
            if (failure == null) failure = e.getCause
        }
      }
      if (failure != null) throw failure
    } finally pool.shutdown()
    if (!allStaged) Files.write(done, Array.emptyByteArray)
    else Files.setLastModifiedTime(done, // LRU touch: marker mtime = last use
      java.nio.file.attribute.FileTime.fromMillis(System.currentTimeMillis()))
    root.toString
  }

  override def resolve(spark: SparkSession, uri: String): String = {
    val name = uri.split('/').last
    val staged = stage(Seq((uri, if (name.isEmpty) "object" else name)))
    s"$staged/${if (name.isEmpty) "object" else name}"
  }
}

/** Content-addressed fetch-cache maintenance — the `LedgerCatalog`
  * treatment (list / total size / remove / remove-older-than / evict-to-
  * budget) for the staging cache under `java.io.tmpdir/graft_fetch`, which
  * otherwise accretes one never-evicted directory per content key. An
  * entry's LAST USE is its `_STAGED` marker's mtime — [[HttpFetcher.stage]]
  * touches the marker on every cache hit — so eviction is true LRU, not
  * creation-order. Nothing evicts implicitly (same discipline as
  * `Ledger.compact`): a removed entry is re-fetched on next use, and
  * content-keyed naming makes removal always safe — there is no dangling
  * reference a re-fetch wouldn't recreate bit-identically.
  */
object FetchCache {
  def root: Path =
    Paths.get(System.getProperty("java.io.tmpdir"), "graft_fetch")

  final case class Entry(key: String, path: String, sizeBytes: Long,
                         nFiles: Int, lastUsedMs: Long)

  private def walkSize(p: Path): (Long, Int) = {
    var bytes = 0L
    var n = 0
    val st = Files.walk(p)
    try st.forEach { f =>
      if (Files.isRegularFile(f)) { bytes += Files.size(f); n += 1 }
    } finally st.close()
    (bytes, n)
  }

  /** One row per cached staging root, oldest-used first. */
  def list(under: Path = root): Seq[Entry] = {
    val r = under
    if (!Files.isDirectory(r)) return Nil
    val st = Files.list(r)
    val dirs = try {
      import scala.jdk.CollectionConverters._
      st.iterator().asScala.filter(Files.isDirectory(_)).toVector
    } finally st.close()
    dirs.map { d =>
      val marker = d.resolve("_STAGED")
      val lastUsed =
        (if (Files.exists(marker)) Files.getLastModifiedTime(marker)
         else Files.getLastModifiedTime(d)).toMillis
      val (bytes, n) = walkSize(d)
      Entry(d.getFileName.toString, d.toString, bytes, n, lastUsed)
    }.sortBy(_.lastUsedMs)
  }

  def totalSizeBytes(under: Path = root): Long =
    list(under).map(_.sizeBytes).sum

  private def delete(p: Path): Unit = {
    val st = Files.walk(p)
    try {
      import scala.jdk.CollectionConverters._
      st.iterator().asScala.toVector.reverseIterator // children before dirs
        .foreach(Files.deleteIfExists(_))
    } finally st.close()
  }

  /** Remove entries by exact content key. Returns the number removed. */
  def remove(keys: Seq[String], under: Path = root): Int = {
    val ks = keys.toSet
    list(under).filter(e => ks.contains(e.key))
      .map { e => delete(Paths.get(e.path)); 1 }.sum
  }

  /** Remove entries last used before `cutoffMs`. Returns count removed. */
  def removeOlderThan(cutoffMs: Long, under: Path = root): Int =
    list(under).filter(_.lastUsedMs < cutoffMs)
      .map { e => delete(Paths.get(e.path)); 1 }.sum

  /** LRU-evict oldest-used entries until the cache fits `maxBytes`.
    * Returns the number of entries removed.
    */
  def evictToSize(maxBytes: Long, under: Path = root): Int = {
    val entries = list(under) // oldest first
    var total = entries.map(_.sizeBytes).sum
    var removed = 0
    entries.iterator.takeWhile(_ => total > maxBytes).foreach { e =>
      delete(Paths.get(e.path)); total -= e.sizeBytes; removed += 1
    }
    removed
  }
}

/** `hf://datasets/<org>/<repo>/<path>` → public HTTPS resolve form,
  * delegated to the HTTP backend (fsspec's hf protocol).
  */
class HfFetcher(http: HttpFetcher) extends Fetcher {
  override val schemes: Seq[String] = Seq("hf")

  private[graft] def toHttps(uri: String): String = {
    val rest = uri.stripPrefix("hf://")
    require(rest.startsWith("datasets/"),
      s"hf URI must be hf://datasets/<org>/<repo>/<path>: $uri")
    val parts = rest.split("/", 4)
    require(parts.length == 4, s"hf URI too short: $uri")
    s"https://huggingface.co/${parts(0)}/${parts(1)}/${parts(2)}/resolve/main/${parts(3)}"
  }

  override def resolve(spark: SparkSession, uri: String): String =
    http.resolve(spark, toHttps(uri))
  override def fetch(spark: SparkSession, uri: String): Array[Byte] =
    http.fetch(spark, toHttps(uri))
}

/** Scheme registry — `era5.py:103`'s backend table as a mutable map. */
object Fetchers {
  private val registry = TrieMap.empty[String, Fetcher]

  private val defaultHttp = new HttpFetcher
  Seq(LocalFetcher, HadoopFetcher, defaultHttp, new HfFetcher(defaultHttp))
    .foreach(register)

  def register(f: Fetcher): Unit =
    f.schemes.foreach(s => registry.put(s, f))

  def forScheme(scheme: String): Fetcher =
    registry.getOrElse(scheme.toLowerCase(java.util.Locale.ROOT),
      throw new IllegalArgumentException(
        s"no Fetcher registered for scheme '$scheme' " +
          s"(registered: ${registry.keys.toSeq.sorted.mkString(", ")})"))

  private def schemeOf(uri: String): String = {
    val i = uri.indexOf("://")
    if (i < 0) "" else uri.substring(0, i)
  }

  /** Resolve a dataset root URI through its scheme's backend. */
  def resolve(spark: SparkSession, uri: String): String =
    forScheme(schemeOf(uri)).resolve(spark, uri)

  /** Fetch one metadata-sized object through its scheme's backend. */
  def fetch(spark: SparkSession, uri: String): Array[Byte] =
    forScheme(schemeOf(uri)).fetch(spark, uri)
}
