package graft.sinks

import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Real Zarr v2 directory-store writer + reader (reference
  * `domains/da/sinks/zarr_writer.py`, `domains/atm/sinks/zarr_writer.py`,
  * `domains/mesh/sinks/mesh_zarr.py` — which delegate to zarr-python; this
  * is an independent implementation of the PUBLIC zarr v2 spec), Spark-first:
  *
  *  - `.zarray` metadata: C-order, little-endian `<f8`, zlib compressor,
  *    explicit fill value — written driver-side (tiny JSON);
  *  - chunk files `"ci.cj"`: each chunk is built and compressed ON AN
  *    EXECUTOR from its own rows (`repartition` by chunk key →
  *    `foreachPartition`), so chunk writes are disjoint and parallel —
  *    exactly the region-write discipline of `zarr_writer.py:471-512`,
  *    provided here by the chunk-grid partitioning itself;
  *  - sparse input: absent cells hold the fill value (dense chunks are
  *    materialized per chunk, never per array).
  *
  * The reader is the inverse (used by round-trip gates and as a zarr
  * ingestion path): chunk files are listed distributed via `binaryFile`
  * and inflated per-task into long (i, j, value) rows.
  */
object ZarrStore {

  private def zlib(b: Array[Byte]): Array[Byte] = {
    val d = new java.util.zip.Deflater()
    try {
      d.setInput(b); d.finish()
      val out = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](8192)
      while (!d.finished()) out.write(buf, 0, d.deflate(buf))
      out.toByteArray
    } finally d.end()
  }

  private def inflate(b: Array[Byte], outLen: Int): Array[Byte] = {
    val inf = new java.util.zip.Inflater()
    try {
      inf.setInput(b)
      val out = new Array[Byte](outLen)
      var n = 0
      while (n < outLen && !inf.finished()) n += inf.inflate(out, n, outLen - n)
      require(n == outLen, s"zarr chunk inflated to $n bytes, expected $outLen")
      out
    } finally inf.end()
  }

  private def writeFile(path: String, bytes: Array[Byte],
                        conf: org.apache.hadoop.conf.Configuration): Unit = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(conf)
    fs.setWriteChecksum(false) // no .crc sidecars — external zarr readers
    val os = fs.create(p, true)
    try os.write(bytes) finally os.close()
  }

  private def elemSize(dtype: String): Int = dtype match {
    case "<f8" => 8
    case "<f4" => 4
    case "<f2" => 2
    case other => throw new IllegalArgumentException(
      s"zarr dtype '$other' unsupported (<f8|<f4|<f2)")
  }

  private def putCell(bb: ByteBuffer, dtype: String, v: Double): Unit =
    dtype match {
      case "<f8" => bb.putDouble(v)
      case "<f4" => bb.putFloat(v.toFloat)
      case "<f2" => bb.putShort(graft.functions.Half.toHalf(v.toFloat))
    }

  private def getCell(bb: ByteBuffer, dtype: String, idx: Int): Double =
    dtype match {
      case "<f8" => bb.getDouble(idx * 8)
      case "<f4" => bb.getFloat(idx * 4).toDouble
      case "<f2" => graft.functions.Half.fromHalf(bb.getShort(idx * 2)).toDouble
    }

  /** The on-disk dtype a tagged DataFrame asks for: a `float16` precision
    * tag ([[graft.operators.FieldOps.PrecisionKey]]) narrows to `<f2`;
    * an untagged FloatType column (or a `bfloat16` tag — zarr v2's numpy
    * dtype codes have no bf16, so it falls back to the narrowest lossless
    * container) maps to `<f4`; everything else stays `<f8`.
    */
  def dtypeFor(df: DataFrame, valueCol: String = "value"): String = {
    val field = df.schema(valueCol)
    val tag =
      if (field.metadata.contains(graft.operators.FieldOps.PrecisionKey))
        Some(field.metadata.getString(graft.operators.FieldOps.PrecisionKey))
      else None
    tag match {
      case Some("float16") => "<f2"
      case Some("bfloat16") => "<f4"
      case _ => field.dataType match {
        case org.apache.spark.sql.types.FloatType => "<f4"
        case _ => "<f8"
      }
    }
  }

  /** Write a 2-D float array from long rows (i, j, value). Cells absent
    * from `df` hold `fillValue`; duplicate cells are rejected upstream by
    * construction (one row per (i, j): aggregate first). `dtype` selects
    * the on-disk width (`<f8`/`<f4`/`<f2` — half values round to nearest
    * even via [[graft.functions.Half]]); pass [[dtypeFor]]'s answer to
    * honor a [[graft.operators.FieldOps.precisionCast]] tag. Returns the
    * array path.
    */
  def writeArray2D(df: DataFrame, out: String, shape: (Long, Long),
                   chunks: (Int, Int), fillValue: Double = 0.0,
                   dtype: String = "<f8"): String = {
    val esz = elemSize(dtype)
    val spark = df.sparkSession
    val (n, m) = shape
    val (ci, cj) = chunks
    val nci = ((n + ci - 1) / ci).toInt
    val ncj = ((m + cj - 1) / cj).toInt
    val hadoopConf = new org.apache.spark.util.SerializableConfiguration(
      spark.sparkContext.hadoopConfiguration)

    // a rewrite must not inherit stale chunks from a previous store at the
    // same path (the fill loop below would skip existing files)
    val outPath = new org.apache.hadoop.fs.Path(out)
    val outFs = outPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (outFs.exists(outPath)) outFs.delete(outPath, true)

    // one task per populated chunk; empty chunks are materialized below
    df.select(col("i").cast("long").as("i"), col("j").cast("long").as("j"),
      col("value").cast("double").as("value"))
      .withColumn("_ci", (col("i") / ci).cast("int"))
      .withColumn("_cj", (col("j") / cj).cast("int"))
      .repartition(col("_ci"), col("_cj"))
      .foreachPartition { rows: Iterator[org.apache.spark.sql.Row] =>
        val byChunk = rows.toSeq.groupBy(r => (r.getInt(3), r.getInt(4)))
        byChunk.foreach { case ((cci, ccj), rs) =>
          val buf = Array.fill(ci * cj)(fillValue)
          rs.foreach { r =>
            val gi = r.getLong(0); val gj = r.getLong(1)
            // out-of-shape rows would land in out-of-grid chunk files that
            // readArray2D clips away — fail loudly instead (NetCdfSink.render
            // applies the same per-cell bounds contract)
            require(gi >= 0 && gi < n && gj >= 0 && gj < m,
              s"zarr cell ($gi, $gj) outside array shape ($n, $m)")
            val li = (gi - cci.toLong * ci).toInt
            val lj = (gj - ccj.toLong * cj).toInt
            buf(li * cj + lj) = r.getDouble(2)
          }
          val bb = ByteBuffer.allocate(ci * cj * esz).order(ByteOrder.LITTLE_ENDIAN)
          buf.foreach(putCell(bb, dtype, _))
          writeFile(s"$out/$cci.$ccj", zlib(bb.array()), hadoopConf.value)
        }
      }

    // Fill wholly-empty chunks so the on-disk grid is complete. (The zarr
    // v2 spec also permits OMITTING them — readers substitute fill_value —
    // which is the right call for very sparse arrays; written here so our
    // own reader's distributed listing sees every cell.)
    val fs = new org.apache.hadoop.fs.Path(out)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val emptyChunk = {
      val bb = ByteBuffer.allocate(ci * cj * esz).order(ByteOrder.LITTLE_ENDIAN)
      (0 until ci * cj).foreach(_ => putCell(bb, dtype, fillValue))
      zlib(bb.array())
    }
    for (a <- 0 until nci; b <- 0 until ncj) {
      val p = new org.apache.hadoop.fs.Path(s"$out/$a.$b")
      if (!fs.exists(p)) writeFile(s"$out/$a.$b", emptyChunk,
        spark.sparkContext.hadoopConfiguration)
    }

    val zarray =
      s"""{"zarr_format":2,"shape":[$n,$m],"chunks":[$ci,$cj],"dtype":"$dtype",
         |"compressor":{"id":"zlib","level":-1},"fill_value":$fillValue,
         |"order":"C","filters":null}""".stripMargin.replaceAll("\n", "")
    writeFile(s"$out/.zarray", zarray.getBytes("UTF-8"),
      spark.sparkContext.hadoopConfiguration)
    out
  }

  /** Read a 2-D zlib zarr array (`<f8`/`<f4`/`<f2`) back to long rows
    * (i, j, value): chunk files distributed via `binaryFile`, inflated per
    * task; edge chunks clip to the array shape. Values widen to double
    * (exact for every narrower float).
    */
  private def readMeta(spark: SparkSession, path: String): String = {
    val p = new org.apache.hadoop.fs.Path(s"$path/.zarray")
    val in = p.getFileSystem(spark.sparkContext.hadoopConfiguration).open(p)
    try {
      val out = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](4096)
      var n = in.read(buf)
      while (n > 0) { out.write(buf, 0, n); n = in.read(buf) }
      out.toString("UTF-8")
    } finally in.close()
  }

  /** The stored dtype code of an array (round-trip gates assert `<f2` for
    * float16-tagged writes without re-reading every chunk).
    */
  def arrayDtype(spark: SparkSession, path: String): String =
    """"dtype":"([^"]+)"""".r.findFirstMatchIn(readMeta(spark, path))
      .map(_.group(1))
      .getOrElse(throw new IllegalArgumentException(s"no dtype in $path/.zarray"))

  def readArray2D(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    val metaBytes = readMeta(spark, path)
    def longs(key: String): Seq[Long] =
      s""""$key":\\[(\\d+),(\\d+)\\]""".r.findFirstMatchIn(metaBytes)
        .map(m => Seq(m.group(1).toLong, m.group(2).toLong))
        .getOrElse(throw new IllegalArgumentException(s"no $key in .zarray"))
    val dtype = """"dtype":"(<f[842])"""".r.findFirstMatchIn(metaBytes)
      .map(_.group(1))
      .getOrElse(throw new IllegalArgumentException(
        "only <f8/<f4/<f2 zarr arrays supported"))
    require(metaBytes.contains("\"zlib\""), "only zlib-compressed zarr supported")
    val esz = elemSize(dtype)
    val Seq(n, m) = longs("shape")
    val Seq(ci, cj) = longs("chunks").map(_.toInt)

    spark.read.format("binaryFile").load(path)
      .filter(!col("path").endsWith(".zarray"))
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .flatMap { case (p, bytes) =>
        val name = p.split("/").last
        val Array(cci, ccj) = name.split("\\.").map(_.toInt)
        val raw = inflate(bytes, ci * cj * esz)
        val bb = ByteBuffer.wrap(raw).order(ByteOrder.LITTLE_ENDIAN)
        for {
          li <- 0 until ci
          lj <- 0 until cj
          i = cci.toLong * ci + li
          j = ccj.toLong * cj + lj
          if i < n && j < m
        } yield (i, j, getCell(bb, dtype, li * cj + lj))
      }.toDF("i", "j", "value")
  }
}
