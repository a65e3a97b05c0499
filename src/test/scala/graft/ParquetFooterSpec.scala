package graft

import org.apache.spark.sql.functions._

import graft.sources.ParquetFooter

class ParquetFooterSpec extends SparkSpec {

  test("footer parse recovers schema, stats, and codec from a Spark file") {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("pqfoot").toString
    Seq((5L, Some("aa"), 1.5), (99L, None, -2.0), (42L, Some("zz"), 0.25))
      .toDF("k", "txt", "x")
      .coalesce(1).write.mode("overwrite").parquet(dir)
    val got = ParquetFooter.readMetadata(s, s"$dir/*.parquet")
      .collect().map(r => r.getAs[String]("col_name") -> r).toMap
    assert(got.keySet === Set("k", "txt", "x"))
    val k = got("k")
    assert(k.getAs[String]("type") === "INT64")
    assert(k.getAs[Long]("num_values") === 3L)
    assert(k.getAs[String]("codec") === "SNAPPY") // Spark default
    assert(k.getAs[String]("min_v") === "5")
    assert(k.getAs[String]("max_v") === "99")
    assert(k.getAs[Long]("null_count") === 0L)
    val t = got("txt")
    assert(t.getAs[String]("type") === "BYTE_ARRAY")
    assert(t.getAs[String]("min_v") === "aa")
    assert(t.getAs[String]("max_v") === "zz")
    assert(t.getAs[Long]("null_count") === 1L)
    assert(got("x").getAs[String]("type") === "DOUBLE")
    assert(got("x").getAs[Long]("n_compressed") > 0)
    assert(got("x").getAs[Long]("n_uncompressed") > 0)
  }

  test("multiple row groups surface separately with per-group stats") {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("pqfoot2").toString
    (1L to 5000L).toDF("v").coalesce(1)
      .write.mode("overwrite")
      .option("parquet.block.size", 4096) // force several row groups
      .parquet(dir)
    val rows = ParquetFooter.readMetadata(s, s"$dir/*.parquet")
      .orderBy("rg").collect()
    assert(rows.length > 1, "expected multiple row groups")
    assert(rows.map(_.getAs[Long]("num_values")).sum === 5000L)
    // per-group min/max partition the value range in order
    assert(rows.head.getAs[String]("min_v") === "1")
    assert(rows.last.getAs[String]("max_v") === "5000")
    val bounds = rows.map(r =>
      (r.getAs[String]("min_v").toLong, r.getAs[String]("max_v").toLong))
    bounds.sliding(2).foreach {
      case Array((_, hi), (lo2, _)) => assert(hi < lo2)
      case _ =>
    }
  }

  test("malformed tails reject loudly") {
    val s = spark
    val dir = java.nio.file.Files.createTempDirectory("pqfoot3")
    val bad = dir.resolve("bad.parquet")
    java.nio.file.Files.write(bad, "PAR1 but nothing sensible here".getBytes)
    val fs = new org.apache.hadoop.fs.Path(bad.toString)
      .getFileSystem(s.sparkContext.hadoopConfiguration)
    intercept[IllegalArgumentException](
      ParquetFooter.readFooterBytes(fs, new org.apache.hadoop.fs.Path(bad.toString)))
  }
}
