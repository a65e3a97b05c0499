package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Manual salting vs AQE skew-join evidence (VERDICT r8 item 7).
  *
  * TPC-H keys are uniform (ScaleUp preserves per-key distribution), so this
  * probe synthesizes the skew the salted join exists for: lineitem scaled
  * K× with `hotPct` percent of l_orderkey values collapsed onto ONE hot
  * key. It then runs the same join+aggregate three ways —
  *
  *   noaqe   plain shuffle join, AQE off (the straggler baseline)
  *   aqe     plain shuffle join, AQE skew-join on (runtime split)
  *   salted  RelationalOps.saltedJoin (static split, AQE off)
  *
  * — asserting all three produce identical aggregates, timing each, and
  * reporting whether AQE's executed plan actually marked the skewed
  * partition (`skew=true` on the shuffle read). One JSON line per variant
  * plus a summary for BASELINE.md.
  *
  * `runMain graft.tools.SkewProbe <srcSfDir> <workDir> <K> [hotPct]`
  */
object SkewProbe {
  def main(args: Array[String]): Unit = {
    val src = args(0); val work = args(1)
    val k = args(2).toInt
    val hotPct = if (args.length > 3) args(3).toInt else 25
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      // keep the build side off broadcast so the shuffle-join skew is real
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.hadoop.fs.Path

    def wipe(p: String): Unit = {
      val hp = new Path(p)
      val fs = hp.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(hp)) fs.delete(hp, true)
      ()
    }

    // ---- build the skewed pair once, on disk, so every variant pays the
    // same scan. hotPct% of lineitem rows remap to orderkey 0; orders keeps
    // one row per surviving key plus the hot key.
    val liPath = s"$work/li_skew"; val ordPath = s"$work/ord_skew"
    if (!new Path(liPath).getFileSystem(spark.sparkContext.hadoopConfiguration)
          .exists(new Path(liPath))) {
      wipe(liPath); wipe(ordPath)
      val t0 = System.nanoTime()
      val li = ScaleUp.scaleTable(spark, src, "lineitem", k)
        .select(col("l_orderkey"), col("l_partkey"), col("l_quantity"))
        // deterministic hot assignment: hash of the row's own keys
        .withColumn("k",
          when(pmod(hash(col("l_orderkey"), col("l_partkey")), lit(100)) < hotPct, lit(0L))
            .otherwise(col("l_orderkey")))
        .drop("l_orderkey")
      li.write.parquet(liPath)
      val ord = ScaleUp.scaleTable(spark, src, "orders", k)
        .select(col("o_orderkey").as("k"), col("o_orderpriority"))
        .union(spark.range(1).select(lit(0L).as("k"), lit("0-HOT").as("o_orderpriority")))
      ord.write.parquet(ordPath)
      println(f"""{"phase":"build","k":$k,"hot_pct":$hotPct,"sec":${(System.nanoTime() - t0) / 1e9}%.1f}""")
    }

    val li = spark.read.parquet(liPath)
    val ord = spark.read.parquet(ordPath)
    val nLi = li.count(); val nHot = li.filter(col("k") === 0L).count()
    println(s"""{"phase":"data","lineitem_rows":$nLi,"hot_rows":$nHot}""")

    def agg(j: DataFrame): DataFrame =
      j.groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n"), round(sum("l_quantity"), 2).as("sum_qty"))

    def run(tag: String)(body: => DataFrame): (Set[String], Double, String) = {
      val t0 = System.nanoTime()
      val df = agg(body)
      // collect() executes THIS queryExecution, so the executedPlan below
      // is the AQE FINAL plan (isFinalPlan=true), not the initial one
      val rows = df.collect().map(_.mkString("|")).toSet
      val sec = (System.nanoTime() - t0) / 1e9
      val plan = df.queryExecution.executedPlan.toString
      (rows, sec, plan)
    }

    def withConf[T](pairs: (String, String)*)(body: => T): T = {
      val saved = pairs.map { case (key, _) => key -> spark.conf.getOption(key) }
      pairs.foreach { case (key, v) => spark.conf.set(key, v) }
      try body
      finally saved.foreach {
        case (key, Some(v)) => spark.conf.set(key, v)
        case (key, None) => spark.conf.unset(key)
      }
    }

    var reference: Set[String] = null
    Seq("noaqe", "aqe", "salted8", "salted32").foreach { variant =>
      val (rows, sec, plan) = variant match {
        case "noaqe" =>
          withConf("spark.sql.adaptive.enabled" -> "false") {
            run(variant)(li.join(ord, "k"))
          }
        case "aqe" =>
          withConf(
            "spark.sql.adaptive.enabled" -> "true",
            "spark.sql.adaptive.skewJoin.enabled" -> "true",
            // local-mode data is far under the 256 MB production default;
            // scale the trigger to the probe so the splitter engages the
            // same way a 100 TB hot partition would
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "8m",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "8m") {
            run(variant)(li.join(ord, "k"))
          }
        case "salted8" =>
          withConf("spark.sql.adaptive.enabled" -> "false") {
            run(variant)(
              graft.operators.RelationalOps.saltedJoin(li, ord, "k", "l_partkey", nSalts = 8))
          }
        case "salted32" =>
          // literal 32, NOT the SPARK_GRAFT_CPUS count — the variant label
          // names the salt count, so the measurement must match it
          withConf("spark.sql.adaptive.enabled" -> "false") {
            run(variant)(
              graft.operators.RelationalOps.saltedJoin(li, ord, "k", "l_partkey", nSalts = 32))
          }
      }
      if (reference == null) reference = rows
      val parity = rows == reference
      val skewMarked = plan.contains("skew=true")
      println(f"""{"variant":"$variant","sec":$sec%.1f,"parity":$parity,"aqe_skew_marked":$skewMarked}""")
      require(parity, s"$variant results differ from reference")
    }
    spark.stop()
  }
}
