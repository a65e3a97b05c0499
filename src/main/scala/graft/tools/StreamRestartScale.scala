package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scaled streaming kill/resume step (VERDICT r8 item 4): the
  * StreamingRestartSpec protocol — drain, KILL, more data arrives while
  * down, restart from the same checkpoint, drain — run at ScaleUp'd data
  * volume instead of fixture rows, with the drained result compared to
  * the one-shot batch aggregation over ALL arrivals.
  *
  * `runMain graft.tools.StreamRestartScale <srcSfDir> <workDir> <K>`
  *
  * Phase layout: the K-replicated events table is written as parquet part
  * files; HALF the files are staged into the stream's ingest dir, query 1
  * drains them and is stopped; the remaining files land while the query
  * is down; query 2 starts from the same checkpoint and drains. The
  * memory-sink table (complete mode) after query 2 must equal the batch
  * `windowedGridStats` over the whole scaled table — counts exact,
  * moments to 1e-6 relative (watermark state, window boundaries, and the
  * partial-agg merge all survived the restart at scale). Emits one JSON
  * line with row counts, wall times, and the parity verdict for
  * BASELINE.md.
  */
object StreamRestartScale {
  def main(args: Array[String]): Unit = {
    val Array(src, work, kStr) = args
    val k = kStr.toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.hadoop.fs.{FileUtil, Path}

    def wipe(p: String): Unit = {
      val hp = new Path(p)
      val fs = hp.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(hp)) fs.delete(hp, true)
      ()
    }
    Seq(s"$work/scaled", s"$work/ingest", s"$work/ckpt").foreach(wipe)

    // K-replicate events with shifted ids and a +copy*1h time shift so the
    // scaled stream covers more windows too, not just denser ones
    val t0 = System.nanoTime()
    val ev = graft.sources.Tables.events(spark, src)
    val stride = ev.agg(max(col("event_id")).cast("long")).head().getLong(0) + 1L
    val scaled = ev
      .withColumn("__copy", explode(sequence(lit(0L), lit((k - 1).toLong))))
      .withColumn("event_id", col("event_id") + col("__copy") * stride)
      .withColumn("user_id", col("user_id") + col("__copy") * stride)
      .withColumn("ts",
        col("ts") + col("__copy").cast("int") * expr("INTERVAL 1 HOUR"))
      .repartition(32, col("__copy"))
      .drop("__copy")
    scaled.write.parquet(s"$work/scaled")
    val tScale = (System.nanoTime() - t0) / 1e9

    val scaledDf = spark.read.parquet(s"$work/scaled")
    val nRows = scaledDf.count()

    // batch truth over ALL arrivals
    val tb0 = System.nanoTime()
    val truth = graft.streaming.StreamingStats.windowedGridStats(
      scaledDf, "ts", Seq("event_type"), "value",
      windowDur = "30 days", watermarkDelay = "1 hour")
      .select(col("window_start"), col("event_type"), col("n"),
        round(col("mean") + lit(1e-9), 6).as("mean"),
        round(col("var_pop") + lit(1e-9), 6).as("var_pop"),
        col("min"), col("max"))
      .collect().map(_.toSeq).toSet
    val tBatch = (System.nanoTime() - tb0) / 1e9

    // stage HALF the part files, drain, kill; stage the rest; resume
    val scaledPath = new Path(s"$work/scaled")
    val fs = scaledPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val parts = fs.listStatus(scaledPath).map(_.getPath)
      .filter(_.getName.endsWith(".parquet")).sortBy(_.getName)
    require(parts.length >= 2, s"need >=2 part files, got ${parts.length}")
    val (half1, half2) = parts.splitAt(parts.length / 2)
    def stage(ps: Seq[Path]): Unit = ps.foreach { p =>
      FileUtil.copy(fs, p, fs, new Path(s"$work/ingest/${p.getName}"), false,
        spark.sparkContext.hadoopConfiguration)
    }

    def startQuery() = {
      val stream = spark.readStream.schema(scaledDf.schema)
        .option("maxFilesPerTrigger", math.max(1, parts.length / 8))
        .option("recursiveFileLookup", "true")
        .parquet(s"$work/ingest")
      graft.streaming.StreamingStats.windowedGridStats(
        stream, "ts", Seq("event_type"), "value",
        windowDur = "30 days", watermarkDelay = "1 hour")
        .writeStream.format("memory").queryName("restart_scale")
        .outputMode("complete")
        .option("checkpointLocation", s"$work/ckpt")
        .start()
    }

    val ts0 = System.nanoTime()
    stage(half1.toSeq)
    val q1 = startQuery()
    try q1.processAllAvailable() finally q1.stop()
    val tRun1 = (System.nanoTime() - ts0) / 1e9

    stage(half2.toSeq) // data arrives while the query is DOWN

    val ts1 = System.nanoTime()
    val q2 = startQuery()
    try q2.processAllAvailable() finally q2.stop()
    val tRun2 = (System.nanoTime() - ts1) / 1e9

    val drained = spark.table("restart_scale")
      .select(col("window_start"), col("event_type"), col("n"),
        round(col("mean") + lit(1e-9), 6).as("mean"),
        round(col("var_pop") + lit(1e-9), 6).as("var_pop"),
        col("min"), col("max"))
      .collect().map(_.toSeq).toSet

    val parity = drained == truth
    println(s"""{"tool":"StreamRestartScale","k":$k,"rows":$nRows,""" +
      s""""files":${parts.length},"groups":${truth.size},""" +
      s""""scale_sec":$tScale,"batch_sec":$tBatch,""" +
      s""""stream1_sec":$tRun1,"stream2_sec":$tRun2,"parity":$parity}""")
    require(parity, s"drained != batch: ${drained.size} vs ${truth.size} groups")
    spark.stop()
  }
}
