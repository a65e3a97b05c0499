package graft.core

import org.apache.spark.sql.SparkSession

/** Driver-side parquet writer for the BOUNDED materialization dumps (the
  * oracle-read quantizer/constant tables: centroids, codebooks, planes,
  * twiddles, BPE merges). The rows are already ON THE DRIVER — a
  * `Seq.toDF.coalesce(1).write` pays a full Spark job (plan + codegen +
  * scheduling round-trip, ~0.2-0.4 s) per dump to move driver memory to a
  * driver-local file. This writes the same columns in the same order with
  * the same parquet types straight through parquet-mr (the
  * `Ledger.appendLocal` discipline), so the DuckDB oracle's
  * per-directory parquet-glob reads are unchanged.
  *
  * Overwrite semantics match `mode("overwrite")`: the directory is
  * replaced. Supported cell types: Int, Long, Double, String,
  * Seq[Double] (written as the standard 3-level LIST of double, the same
  * physical shape Spark writes for array<double>).
  */
object DriverParquet {

  sealed trait ColT
  case object IntT extends ColT
  case object LongT extends ColT
  case object DoubleT extends ColT
  case object StringT extends ColT
  case object DoubleArrT extends ColT
  case object FloatArrT extends ColT

  private def msgType(cols: Seq[(String, ColT)]): org.apache.parquet.schema.MessageType = {
    import org.apache.parquet.schema.{LogicalTypeAnnotation, Types}
    import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName._
    val b = Types.buildMessage()
    cols.foreach { case (n, t) =>
      t match {
        case IntT => b.addField(Types.optional(INT32).named(n))
        case LongT => b.addField(Types.optional(INT64).named(n))
        case DoubleT => b.addField(Types.optional(DOUBLE).named(n))
        case StringT => b.addField(Types.optional(BINARY)
          .as(LogicalTypeAnnotation.stringType()).named(n))
        case DoubleArrT => b.addField(
          Types.optionalList().optionalElement(DOUBLE).named(n))
        case FloatArrT => b.addField(
          Types.optionalList().optionalElement(FLOAT).named(n))
      }
    }
    b.named("spark_schema")
  }

  def write(spark: SparkSession, dir: String,
            cols: Seq[(String, ColT)], rows: Seq[Seq[Any]]): Unit = {
    import org.apache.parquet.example.data.simple.SimpleGroup
    import org.apache.parquet.hadoop.example.ExampleParquetWriter
    import org.apache.parquet.hadoop.metadata.CompressionCodecName
    import org.apache.parquet.hadoop.util.HadoopOutputFile
    val conf = spark.sparkContext.hadoopConfiguration
    val schema = msgType(cols)
    val target = new org.apache.hadoop.fs.Path(dir)
    val fs = target.getFileSystem(conf)
    // stage beside the target, then swap — a reader never sees a half
    // directory (same stage-then-install shape as the ledger appends)
    val staging = new org.apache.hadoop.fs.Path(
      dir + "_staging_" + java.util.UUID.randomUUID())
    fs.mkdirs(staging)
    val file = new org.apache.hadoop.fs.Path(staging, "part-00000.parquet")
    val writer = ExampleParquetWriter
      .builder(HadoopOutputFile.fromPath(file, conf))
      .withConf(conf).withType(schema)
      .withCompressionCodec(CompressionCodecName.SNAPPY)
      .build()
    try rows.foreach { r =>
      val g = new SimpleGroup(schema)
      cols.zip(r).foreach { case ((n, t), v) =>
        t match {
          case IntT => g.add(n, v.asInstanceOf[Int])
          case LongT => g.add(n, v.asInstanceOf[Long])
          case DoubleT => g.add(n, v.asInstanceOf[Double])
          case StringT => g.add(n, v.asInstanceOf[String])
          case DoubleArrT =>
            val lg = g.addGroup(n)
            v.asInstanceOf[Seq[Double]].foreach { d =>
              lg.addGroup("list").add("element", d)
            }
          case FloatArrT =>
            val lg = g.addGroup(n)
            v.asInstanceOf[Seq[Float]].foreach { d =>
              lg.addGroup("list").add("element", d)
            }
        }
      }
      writer.write(g)
    } finally writer.close()
    fs.delete(target, true)
    require(fs.rename(staging, target),
      s"driver parquet install into $dir failed")
  }
}
