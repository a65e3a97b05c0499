package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale probe for the VTU DSv2 relation's ranged-read contract: generate a
  * file population (nFiles × nPoints × nArrays, appended raw — the layout
  * real VTU corpora use), then measure planning and scan variants whose
  * byte footprints differ by construction:
  *
  *  - `infer`  — schema inference over every file (header bytes only)
  *  - `count`  — count() over mesh_id (headers only, zero payload)
  *  - `one`    — sum of 1 of nArrays arrays (1/nArrays of the array payload)
  *  - `all`    — sum over every array (all array payload, no Points)
  *  - `wide`   — every column incl. x/y/z (arrays + Points payload)
  *
  * Usage: `runMain graft.tools.Dsv2ScanProbe <workDir> <nFiles> <nPoints>
  * <nArrays> [reps]`. Emits one JSON line per variant (median secs); the
  * interesting numbers are the RATIOS — count ≪ one ≪ all ≤ wide — which
  * hold at any file count because every variant's cost is proportional to
  * the bytes its pruned scan actually reads. BASELINE.md records a
  * small-vs-100× file population comparison.
  */
object Dsv2ScanProbe {
  def main(args: Array[String]): Unit = {
    require(args.length >= 4,
      "usage: Dsv2ScanProbe <workDir> <nFiles> <nPoints> <nArrays> [reps]")
    val work = args(0)
    val nFiles = args(1).toInt
    val nPoints = args(2).toInt
    val nArrays = args(3).toInt
    val reps = if (args.length > 4) args(4).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val dataDir = s"$work/vtu_${nFiles}x${nPoints}x$nArrays"
    if (!new java.io.File(dataDir).exists()) {
      val pts = spark.range(nFiles).select(col("id").as("mesh_id"))
        .crossJoin(spark.range(nPoints).select(col("id").as("point_id")))
        .select(col("mesh_id"), col("point_id"),
          (col("point_id") * 0.25).as("x"), (col("mesh_id") * 1.0).as("y"),
          lit(0.0).as("z"))
      val cls = spark.range(nFiles).select(col("id").as("mesh_id"),
        lit(0L).as("cell_id"),
        array(lit(0L), lit(1L), lit(2L)).as("vertices"))
      val pd = pts.select(col("mesh_id"), col("point_id")).crossJoin(
        spark.range(nArrays).select(concat(lit("a"), col("id")).as("field")))
        .select(col("mesh_id"), col("point_id"), col("field"),
          (col("point_id") + length(col("field"))).cast("double").as("value"))
      graft.sinks.VtuSink.write(pts, cls, pd, dataDir, format = "appended")
      println(s"""{"stage":"generate","files":$nFiles,"points":$nPoints,"arrays":$nArrays}""")
    }
    val totalBytes = new java.io.File(dataDir).listFiles()
      .filter(_.getName.endsWith(".vtu")).map(_.length).sum

    // scan through the counting filesystem: wall time at this scale is
    // bounded by long-table row materialization (identical across
    // variants), so the scale-honest signal is BYTES READ — at 100 TB on
    // cold storage the byte ratio is the wall-time ratio
    spark.sparkContext.hadoopConfiguration
      .set("fs.cntfs.impl", classOf[CountingFileSystem].getName)
    def relation() = spark.read.format("graft.sources.VtuDataSource")
      .option("path", s"cntfs:$dataDir").load()

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

    // schema cached after first load() — re-create the reader each rep so
    // `infer` measures the real per-load planning cost
    val variants: Seq[(String, () => Unit)] = Seq(
      ("infer", () => { relation().schema; () }),
      ("count", () => { relation().groupBy("mesh_id").count().count(); () }),
      ("one", () => { relation().agg(sum("a0")).collect(); () }),
      ("all", () => {
        val allSum = (0 until nArrays).map(i => sum(s"a$i")).reduce(_ + _)
        relation().agg(allSum).collect(); ()
      }),
      ("wide", () => {
        val allSum = (0 until nArrays).map(i => sum(s"a$i"))
          .reduce(_ + _) + sum("x") + sum("y")
        relation().agg(allSum).collect(); ()
      }))
    variants.foreach { case (name, f) =>
      val (sec, bytes) = time(f)
      println(f"""{"variant":"$name","sec":$sec%.2f,"read_mb":${bytes / (1 << 20)},"files":$nFiles,"total_mb":${totalBytes / (1 << 20)}}""")
    }
    spark.stop()
  }
}
