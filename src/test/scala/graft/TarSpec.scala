package graft

import java.nio.file.{Files, Paths}

import graft.sinks.TarSink
import graft.sources.TarSource

/** Tar/WebDataset shard codec: render→parse round trips (plain + gzip,
  * prefix split, GNU long names), checksum enforcement, interop with the
  * system `tar` in both directions, and the distributed
  * writeShards→readSamples cycle with no-shuffle sample grouping.
  */
class TarSpec extends SparkSpec {

  private val members = Seq(
    "000000.txt" -> "hello tar".getBytes("UTF-8"),
    "000000.bin" -> Array.tabulate(513)(i => (i % 251).toByte), // crosses a block
    "000001.txt" -> Array.emptyByteArray,                        // zero-size member
    "000001.json" -> """{"k":1}""".getBytes("UTF-8"))

  test("render -> parse round trip preserves names, order, mtimes, bytes") {
    val bytes = TarSink.render(members, mtime = 1700000000L)
    assert(bytes.length % 512 === 0)
    val back = TarSource.parse(bytes)
    assert(back.map(_.name) === members.map(_._1))
    assert(back.forall(_.mtime == 1700000000L))
    back.zip(members).foreach { case (e, (_, b)) =>
      assert(java.util.Arrays.equals(e.bytes, b), e.name)
    }
  }

  test("gzip round trip is transparent and deterministic") {
    val gz1 = TarSink.render(members, gzip = true)
    val gz2 = TarSink.render(members, gzip = true)
    assert(java.util.Arrays.equals(gz1, gz2), "gzip render must be deterministic")
    assert((gz1(0) & 0xff) === 0x1f && (gz1(1) & 0xff) === 0x8b)
    val back = TarSource.parse(gz1)
    assert(back.map(_.name) === members.map(_._1))
  }

  test("zstd round trip is transparent (RFC 8878 magic, .tar.zst shards)") {
    val z1 = TarSink.render(members, zstd = true)
    assert((z1(0) & 0xff) === 0x28 && (z1(1) & 0xff) === 0xb5 &&
      (z1(2) & 0xff) === 0x2f && (z1(3) & 0xff) === 0xfd)
    val back = TarSource.parse(z1)
    assert(back.map(_.name) === members.map(_._1))
    assert(back.map(_.bytes.toSeq) === members.map(_._2.toSeq))
  }

  test("long names: prefix split when a slash allows it, GNU L record otherwise") {
    val dir = "d" * 90
    val splittable = s"$dir/${"n" * 60}.txt" // >100, splits at the slash
    val unsplittable = ("x" * 140) + ".txt"  // no slash: needs the L record
    val bytes = TarSink.render(Seq(
      splittable -> "a".getBytes, unsplittable -> "b".getBytes))
    val back = TarSource.parse(bytes)
    assert(back.map(_.name) === Seq(splittable, unsplittable))
    assert(back.map(_.bytes.toSeq) === Seq(Seq('a'.toByte), Seq('b'.toByte)))
  }

  test("corrupted header checksum is rejected") {
    val bytes = TarSink.render(members)
    bytes(0) = (bytes(0) + 1).toByte // flip a name byte, checksum now stale
    val e = intercept[IllegalArgumentException](TarSource.parse(bytes))
    assert(e.getMessage.contains("checksum"))
  }

  test("system tar extracts our archives; we parse system tar's") {
    val tmp = Files.createTempDirectory("tarspec").toFile
    val ours = new java.io.File(tmp, "ours.tar")
    Files.write(ours.toPath, TarSink.render(members, mtime = 1700000000L))
    val exDir = new java.io.File(tmp, "ex"); exDir.mkdirs()
    val ex = new ProcessBuilder("tar", "-xf", ours.getAbsolutePath,
      "-C", exDir.getAbsolutePath).inheritIO().start()
    assert(ex.waitFor() === 0, "system tar rejected our archive")
    members.foreach { case (n, b) =>
      assert(java.util.Arrays.equals(
        Files.readAllBytes(Paths.get(exDir.getAbsolutePath, n)), b), n)
    }
    // reverse: a system-tar archive of the extracted tree parses cleanly
    val theirs = new java.io.File(tmp, "theirs.tar")
    val mk = new ProcessBuilder("tar", "-cf", theirs.getAbsolutePath,
      "-C", exDir.getAbsolutePath, "000000.txt", "000000.bin",
      "000001.txt", "000001.json").inheritIO().start()
    assert(mk.waitFor() === 0)
    val back = TarSource.parse(Files.readAllBytes(theirs.toPath))
    assert(back.map(_.name).sorted === members.map(_._1).sorted)
    back.foreach { e =>
      val want = members.toMap.apply(e.name)
      assert(java.util.Arrays.equals(e.bytes, want), e.name)
    }
  }

  test("planShards: ordered size-aware assignment, partitioning-independent") {
    val s = spark
    import s.implicits._
    val rows = (1L to 100L).map(i => (i, 10L + (i % 7) * 5)) // sizes 10..40
    val df = rows.toDF("k", "sz")
    val plan = graft.sinks.TarSink.planShards(df, "k", "sz", targetBytes = 100L)
      .select("k", "shard_id").collect().map(r => (r.getLong(0), r.getLong(1)))
      .sortBy(_._1)
    // shard ids are non-decreasing in key order and start at 0
    assert(plan.head._2 == 0L)
    assert(plan.sliding(2).forall(p => p(0)._2 <= p(1)._2))
    // each shard's exclusive-start is under one target of its members' sum
    val sizes = rows.toMap
    val byShard = plan.groupBy(_._2).toSeq.sortBy(_._1)
    val totals = byShard.map { case (sid, ks) => sid -> ks.map(k => sizes(k._1)).sum }
    // every shard except possibly the last crosses the target boundary
    assert(totals.dropRight(1).forall(_._2 >= 60L), totals.toString)
    val repartitioned = graft.sinks.TarSink
      .planShards(df.repartition(7), "k", "sz", targetBytes = 100L)
      .select("k", "shard_id").collect().map(r => (r.getLong(0), r.getLong(1)))
      .sortBy(_._1)
    assert(repartitioned.toSeq == plan.toSeq)
  }

  test("writeShards -> readSamples: grouped samples, exts sorted, no shuffle in read") {
    val s = spark
    import s.implicits._
    val rows = (0 until 6).flatMap { i =>
      val shard = if (i % 2 == 0) "shard-0.tar" else "shard-1.tar.gz"
      val key = f"s$i%04d"
      Seq((shard, s"$key.txt", s"text-$i".getBytes("UTF-8"), i * 2L),
        (shard, s"$key.bin", Array((i + 1).toByte), i * 2L + 1))
    }
    val dir = Files.createTempDirectory("tarshards").toString
    val written = TarSink.writeShards(
      rows.toDF("shard", "name", "payload", "seq"), dir)
    assert(written.collect().map(r => (r.getString(0), r.getLong(1))).sorted
      === Array(("shard-0.tar", 6L), ("shard-1.tar.gz", 6L)))
    val samples = TarSource.readSamples(spark, s"$dir/*")
    // sample grouping happens inside the per-shard parse task: the plan
    // must contain no Exchange
    val plan = samples.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"sample grouping must not shuffle:\n$plan")
    val got = samples.select("shard", "key", "exts").as[(String, String, Seq[String])]
      .collect().sortBy(r => (r._1, r._2))
    assert(got.length === 6)
    assert(got.forall(_._3 == Seq("bin", "txt")))
    val texts = samples.selectExpr("key", "decode(payloads[1], 'UTF-8') AS t")
      .as[(String, String)].collect().toMap
    assert(texts("s0003") === "text-3")
  }
}
