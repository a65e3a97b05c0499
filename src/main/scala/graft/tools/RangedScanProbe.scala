package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale probe for the round-10 ranged-read scan paths — NetCDF
  * per-variable preads and the LMDB page walk — the sibling of
  * [[Dsv2ScanProbe]] (which covers VTU). Generates file populations and
  * measures scan variants whose byte footprints differ by construction:
  *
  * NetCDF (nFiles single-variable `.nc` record grids, the sink layout —
  * a pushed `variable` predicate prunes whole files to header bytes):
  *  - `nc_count` — count() (header parse per file, values still decode)
  *  - `nc_one`   — sum(value) over ONE variable (one file's payload)
  *  - `nc_all`   — sum(value) with no predicate (every file's payload)
  *
  * LMDB (nShards `.aselmdb` environments, every row's zlib JSON in
  * F_BIGDATA overflow pages):
  *  - `lmdb_ids`  — ids only (B-tree skeleton pages; overflow unread)
  *  - `lmdb_json` — ids + json (skeleton + every overflow run)
  *
  * Usage: `runMain graft.tools.RangedScanProbe <workDir> <nFiles>
  * <valuesPerFile> <rowsPerShard> [reps]` — nFiles drives both the
  * NetCDF file count (one variable per file) and the LMDB shard count
  * (nShards = nFiles / 4 min 2). The scale-honest
  * signal is BYTES READ: on cold 100 TB storage the byte ratio is the
  * wall-time ratio. BASELINE.md records a small vs 100× comparison.
  */
object RangedScanProbe {
  def main(args: Array[String]): Unit = {
    require(args.length >= 4,
      "usage: RangedScanProbe <workDir> <nFiles> <valuesPerFile> <rowsPerShard> [reps]")
    val work = args(0)
    val nFiles = args(1).toInt
    val perFile = args(2).toInt
    val rowsPerShard = args(3).toInt
    val reps = if (args.length > 4) args(4).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val ncDir = s"$work/nc_${nFiles}x$perFile"
    if (!new java.io.File(ncDir).exists()) {
      // one variable per file (the sink layout): file f carries variable
      // v{f}, so a pushed one-variable predicate keeps 1/nFiles of the
      // payload and costs every other file only its header
      val g = spark.range(nFiles.toLong).select(col("id").as("f"))
        .crossJoin(spark.range(perFile.toLong).select(col("id").as("j")))
        .select(concat(lit("v"), col("f")).as("variable"),
          lit(0L).as("t"), lit(0L).as("i"), col("j"),
          (col("f") * 1000 + col("j")).cast("double").as("value"))
      graft.sinks.NetCdfSink.writeRecordGrids(g, ncDir, shape = (1, perFile),
        nRecs = 1)
      println(s"""{"stage":"generate_nc","files":$nFiles,"values":$perFile}""")
    }
    val ncBytes = new java.io.File(ncDir).listFiles()
      .filter(_.getName.endsWith(".nc")).map(_.length).sum

    val nShards = math.max(2, nFiles / 4)
    val lmdbDir = s"$work/lmdb_${nShards}x$rowsPerShard"
    if (!new java.io.File(lmdbDir).exists()) {
      import spark.implicits._
      // incompressible hex blobs (~5 KB raw, ~2.5 KB after the sink's
      // zlib — well past the 1 KiB inline threshold): every value lands
      // in F_BIGDATA overflow pages
      val blob = (0 until 40)
        .map(i => sha2(concat(lit(s"s$i/"), col("id")), 512))
        .reduce(concat(_, _))
      val rows = spark.range(nShards.toLong * rowsPerShard)
        .select(col("id").as("row_id"),
          concat(lit("""{"energy":"""), col("id") * 0.5, lit(""","blob":""""),
            blob, lit("\"}")).as("json"))
        .repartition(nShards)
      graft.sinks.AseLmdbSink.write(rows, lmdbDir)
      println(s"""{"stage":"generate_lmdb","shards":$nShards,"rows":$rowsPerShard}""")
    }
    val lmdbBytes = new java.io.File(lmdbDir).listFiles()
      .filter(_.getName.endsWith(".aselmdb")).map(_.length).sum

    spark.sparkContext.hadoopConfiguration
      .set("fs.cntfs.impl", classOf[CountingFileSystem].getName)
    def nc() = spark.read.format("graft.sources.NetCdfDataSource")
      .option("path", s"cntfs:$ncDir").load()
    def lmdb() = spark.read.format("graft.sources.AseLmdbDataSource")
      .option("path", s"cntfs:$lmdbDir").load()

    def time(f: () => Unit): (Double, Long) = {
      var bytes = 0L
      val runs = (0 until reps).map { _ =>
        CountingFileSystem.reset()
        val t0 = System.nanoTime(); f()
        val sec = (System.nanoTime() - t0) / 1e9
        bytes = CountingFileSystem.bytesRead.get()
        sec
      }
      (runs.sorted.apply(runs.length / 2), bytes)
    }

    val variants: Seq[(String, Long, () => Unit)] = Seq(
      ("nc_count", ncBytes, () => { nc().count(); () }),
      ("nc_one", ncBytes,
        () => { nc().filter(col("variable") === "v0").agg(sum("value")).collect(); () }),
      ("nc_all", ncBytes, () => { nc().agg(sum("value")).collect(); () }),
      ("lmdb_ids", lmdbBytes,
        () => { lmdb().select("row_id").agg(count(lit(1)), sum("row_id")).collect(); () }),
      ("lmdb_json", lmdbBytes,
        () => { lmdb().agg(count(lit(1)), sum(length(col("json")))).collect(); () }))
    variants.foreach { case (name, total, f) =>
      val (sec, bytes) = time(f)
      println(f"""{"variant":"$name","sec":$sec%.2f,"read_kb":${bytes / 1024},"total_kb":${total / 1024}}""")
    }
    spark.stop()
  }
}
