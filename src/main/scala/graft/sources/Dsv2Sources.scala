package graft.sources

import java.util

import scala.collection.mutable.ArrayBuffer
import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{GlobFilter, Path}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.{EqualTo, Filter, In, IsNotNull}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSourceV2 relations over the exotic byte-format readers, so CATALYST
  * derives reader-level pruning from the query instead of the caller
  * passing include/exclude lists — the reference prunes at its readers the
  * same way (`vtk.py:120-123` key_filters, `era5.py`'s `variables` list,
  * `_key_filter.py:45-110`):
  *
  *  - [[VtuDataSource]] — wide point table, one DOUBLE column per
  *    PointData array; `SupportsPushDownRequiredColumns` maps column
  *    pruning onto `parseVtu`'s include set, so unselected arrays are
  *    NEVER payload-decoded (and Points/Cells decode only when needed).
  *  - [[NetCdfDataSource]] — long `(file, variable, pos, value)` table;
  *    `SupportsPushDownFilters` on `variable` (EqualTo/In) maps predicate
  *    pushdown onto `NetCdfSource.values`' `wanted` set, so unselected
  *    variables are never read.
  *  - [[AseLmdbDataSource]] — `(db_id, row_id, json)` rows;
  *    `SupportsPushDownRequiredColumns` skips the zlib inflate + UTF-8
  *    decode of every value when `json` is pruned (id/count scans touch
  *    only the key B-tree).
  *
  * Scale shape: one [[InputPartition]] per file (the curator per-index
  * unit — independently executable and retryable); file listing happens
  * once on the driver, bytes are read ON THE EXECUTOR via Hadoop
  * FileSystem with the driver's Hadoop conf shipped as a string map, so
  * the relations scan distributed on any FileSystem scheme.
  */
object Dsv2 {

  /** Driver-side listing: directory → recursive files matching
    * `globFilter`; globbed path → expansion (filtered by `globFilter`).
    */
  def listFiles(spark: SparkSession, path: String, globFilter: String): Seq[String] = {
    val conf = spark.sparkContext.hadoopConfiguration
    val nameFilter = new GlobFilter(globFilter)
    path.split(",").map(_.trim).filter(_.nonEmpty).toSeq.flatMap { one =>
      val p = new Path(one)
      val fs = p.getFileSystem(conf)
      val roots =
        if (one.exists(c => c == '*' || c == '[' || c == '{' || c == '?'))
          Option(fs.globStatus(p)).map(_.toSeq).getOrElse(Nil)
        else Seq(fs.getFileStatus(p))
      roots.flatMap { st =>
        if (st.isDirectory) {
          val it = fs.listFiles(st.getPath, true)
          val out = ArrayBuffer.empty[String]
          while (it.hasNext) {
            val f = it.next()
            if (nameFilter.accept(f.getPath)) out += f.getPath.toString
          }
          out.toSeq
        } else if (nameFilter.accept(st.getPath)) Seq(st.getPath.toString)
        else Nil
      }
    }.sorted
  }

  /** Hadoop conf as a plain serializable map (Configuration itself is not
    * java-serializable; executors rebuild it to open the FileSystem).
    */
  def confMap(spark: SparkSession): Map[String, String] =
    spark.sparkContext.hadoopConfiguration.iterator().asScala
      .map(e => e.getKey -> e.getValue).toMap

  /** Executor-side whole-file read through the rebuilt Hadoop conf. */
  def readBytes(path: String, conf: Map[String, String]): Array[Byte] = {
    val c = new Configuration(false)
    conf.foreach { case (k, v) => c.set(k, v) }
    val p = new Path(path)
    val fs = p.getFileSystem(c)
    val len = fs.getFileStatus(p).getLen
    require(len <= Int.MaxValue - 8, s"$path too large for a single-array read")
    val in = fs.open(p)
    try {
      val buf = new Array[Byte](len.toInt)
      in.readFully(0, buf)
      buf
    } finally in.close()
  }

  private[sources] def opt(o: CaseInsensitiveStringMap, k: String, dflt: String): String =
    Option(o.get(k)).getOrElse(dflt)

  /** Ranged random-access over a Hadoop path: each `slice` is one
    * positioned `readFully` (pread), so a reader that keeps k of n arrays
    * reads k payloads' bytes, not the file — and per-file size is
    * unbounded (only each individual slice must fit in one array). One
    * open stream per handle; callers close after parsing.
    */
  private[sources] final class HadoopRawData(path: String, conf: Map[String, String])
      extends VtkXmlSource.RawData with AutoCloseable {
    private val c = new Configuration(false)
    conf.foreach { case (k, v) => c.set(k, v) }
    private val p = new Path(path)
    private val fs = p.getFileSystem(c)
    val size: Long = fs.getFileStatus(p).getLen
    private val in = fs.open(p)
    def slice(off: Long, len: Long): Array[Byte] = {
      require(off >= 0 && len >= 0 && off + len <= size,
        s"$path: slice [$off,+$len) outside $size bytes")
      require(len <= Int.MaxValue - 8,
        s"$path: payload of $len bytes exceeds the 2 GiB per-array limit")
      val out = new Array[Byte](len.toInt)
      in.readFully(off, out)
      out
    }
    def close(): Unit = in.close()
  }
}

// ------------------------------------------------------------------ VTU

/** `spark.read.format("graft.sources.VtuDataSource").option("path", dir)`.
  *
  * Default table (`table=points`): `mesh_id STRING, point_id LONG,
  * x/y/z DOUBLE` + one nullable DOUBLE column per PointData array found
  * across the globbed files (union, sorted). `.select` prunes straight to
  * the parser: unselected arrays are never decoded, Points decodes only
  * when x/y/z are referenced, and a count over `mesh_id` alone touches no
  * payload at all (row count from the Piece's NumberOfPoints attribute).
  *
  * `option("table", "cells")`: `mesh_id STRING, cell_id LONG,
  * vertices ARRAY<LONG>` — connectivity decodes only here.
  */
class VtuDataSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val spark = SparkSession.active
    val files = Dsv2.listFiles(spark, Option(options.get("path")).getOrElse(
      throw new IllegalArgumentException("VtuDataSource requires option 'path'")),
      Dsv2.opt(options, "globFilter", "*.vt[up]"))
    require(files.nonEmpty, s"VtuDataSource: no files under ${options.get("path")}")
    if (Dsv2.opt(options, "table", "points") == "cells")
      StructType(Seq(
        StructField("mesh_id", StringType, nullable = false),
        StructField("cell_id", LongType, nullable = false),
        StructField("vertices", ArrayType(LongType), nullable = false)))
    else {
      val conf = Dsv2.confMap(spark)
      // Union of array names across files (heterogeneous runs still get one
      // schema; files lacking an array emit null for it). Each file costs
      // only its XML HEADER bytes — listVtuArraysRaw never touches the
      // appended payload, so planning stays O(header) per file even against
      // multi-GB meshes. `inferLimit` (default 0 = all) samples the first N
      // files when the corpus is homogeneous; `.schema(...)` skips
      // inference entirely (supportsExternalMetadata).
      val limit = Dsv2.opt(options, "inferLimit", "0").toInt
      val sample = if (limit > 0) files.take(limit) else files
      val arrays = sample.flatMap { f =>
        val raw = new Dsv2.HadoopRawData(f, conf)
        try VtkXmlSource.listVtuArraysRaw(raw)._3 finally raw.close()
      }.distinct.sorted
      StructType(
        Seq(StructField("mesh_id", StringType, nullable = false),
          StructField("point_id", LongType, nullable = false),
          StructField("x", DoubleType, nullable = false),
          StructField("y", DoubleType, nullable = false),
          StructField("z", DoubleType, nullable = false)) ++
          arrays.map(a => StructField(a, DoubleType, nullable = true)))
    }
  }

  override def supportsExternalMetadata(): Boolean = true

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new VtuTable(schema, properties.asScala.toMap)
}

private class VtuTable(schema0: StructType, props: Map[String, String])
    extends Table with SupportsRead {
  override def name(): String = s"graft_vtu(${props.getOrElse("path", "")})"
  override def schema(): StructType = schema0
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new VtuScanBuilder(schema0, options)
}

private class VtuScanBuilder(full: StructType, options: CaseInsensitiveStringMap)
    extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = full
  override def pruneColumns(requiredSchema: StructType): Unit = required = requiredSchema
  override def build(): Scan = {
    val spark = SparkSession.active
    val files = Dsv2.listFiles(spark, options.get("path"),
      Dsv2.opt(options, "globFilter", "*.vt[up]"))
    new VtuScan(files, Dsv2.confMap(spark), required,
      Dsv2.opt(options, "table", "points") == "cells")
  }
}

private case class FilePartition(path: String) extends InputPartition

private class VtuScan(files: Seq[String], conf: Map[String, String],
                      required: StructType, cellsTable: Boolean)
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def planInputPartitions(): Array[InputPartition] =
    files.map(f => FilePartition(f): InputPartition).toArray
  override def createReaderFactory(): PartitionReaderFactory =
    new VtuReaderFactory(conf, required.fieldNames, cellsTable)
  override def description(): String =
    s"graft_vtu ReadSchema: ${required.map(f => f.name).mkString(",")}"
}

private class VtuReaderFactory(conf: Map[String, String], cols: Array[String],
                               cellsTable: Boolean)
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val path = p.asInstanceOf[FilePartition].path
    // ranged handle: the XML header reads in a bounded window and each kept
    // DataArray's appended payload is one pread at its offset -- pruning
    // saves I/O BYTES, not just decode CPU, and files past 2 GiB scan fine
    val raw = new Dsv2.HadoopRawData(path, conf)
    val meshId = UTF8String.fromString(path)
    if (cellsTable) {
      val piece =
        try VtkXmlSource.parseVtuRaw(raw, decodePoints = false,
          decodeCells = true, decodePointData = false)
        finally raw.close()
      val cells = piece.cells
      new PartitionReader[InternalRow] {
        private var i = -1
        override def next(): Boolean = { i += 1; i < cells.length }
        override def get(): InternalRow = {
          val values: Array[Any] = cols.map {
            case "mesh_id" => meshId
            case "cell_id" => i.toLong
            case "vertices" => new GenericArrayData(cells(i))
          }
          InternalRow.fromSeq(values.toIndexedSeq)
        }
        override def close(): Unit = ()
      }
    } else {
      val meta = Seq("mesh_id", "point_id", "x", "y", "z")
      val arrays = cols.filterNot(meta.contains)
      val needPoints = cols.exists(c => c == "x" || c == "y" || c == "z")
      val (piece, n) =
        try {
          val pc = VtkXmlSource.parseVtuRaw(raw, include = arrays.toSet,
            decodePoints = needPoints, decodeCells = false,
            decodePointData = arrays.nonEmpty)
          val rows: Long =
            if (needPoints) pc.points.length.toLong
            else pc.pointData.values.headOption.map(_.length.toLong).getOrElse {
              val listed = VtkXmlSource.listVtuArraysRaw(raw)._1
              require(listed >= 0,
                s"$path: no decoded array and no NumberOfPoints attribute to count rows")
              listed
            }
          (pc, rows)
        } finally raw.close()
      val decoded: Map[String, Array[Double]] = piece.pointData
      new PartitionReader[InternalRow] {
        private var i = -1L
        override def next(): Boolean = { i += 1; i < n }
        override def get(): InternalRow = {
          val values: Array[Any] = cols.map {
            case "mesh_id" => meshId
            case "point_id" => i
            case "x" => piece.points(i.toInt)(0)
            case "y" => piece.points(i.toInt)(1)
            case "z" => piece.points(i.toInt)(2)
            case a =>
              decoded.get(a) match {
                case Some(vs) if i < vs.length => vs(i.toInt)
                case _ => null
              }
          }
          InternalRow.fromSeq(values.toIndexedSeq)
        }
        override def close(): Unit = ()
      }
    }
  }
}

// --------------------------------------------------------------- NetCDF

/** `spark.read.format("graft.sources.NetCdfDataSource").option("path", dir)`
  * → `file STRING, variable STRING, pos LONG, value DOUBLE`. A
  * `variable = 'x'` / `variable IN (...)` predicate pushes down into the
  * decoder's `wanted` set, so non-matching variables are never read —
  * the Catalyst-native form of the reference's `variables` selection
  * (`era5.py:103-382`). Options: `globFilter` (default `*.nc`),
  * `decodeCf`, `decodeTimes` (as in [[NetCdfSource.read]]).
  */
class NetCdfDataSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    NetCdfDataSource.Schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new NetCdfTable(properties.asScala.toMap)
}

object NetCdfDataSource {
  val Schema: StructType = StructType(Seq(
    StructField("file", StringType, nullable = false),
    StructField("variable", StringType, nullable = false),
    StructField("pos", LongType, nullable = false),
    StructField("value", DoubleType, nullable = false)))
}

private class NetCdfTable(props: Map[String, String]) extends Table with SupportsRead {
  override def name(): String = s"graft_netcdf(${props.getOrElse("path", "")})"
  override def schema(): StructType = NetCdfDataSource.Schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new NetCdfScanBuilder(options)
}

private class NetCdfScanBuilder(options: CaseInsensitiveStringMap)
    extends ScanBuilder
    with SupportsPushDownRequiredColumns with SupportsPushDownFilters {
  private var required: StructType = NetCdfDataSource.Schema
  private var pushed: Array[Filter] = Array.empty

  override def pruneColumns(requiredSchema: StructType): Unit = required = requiredSchema

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (supported, residual) = filters.partition {
      case EqualTo("variable", _: String) => true
      case In("variable", vs) => vs.forall(_.isInstanceOf[String])
      case IsNotNull("variable") => true
      case _ => false
    }
    pushed = supported
    residual
  }
  override def pushedFilters(): Array[Filter] = pushed

  override def build(): Scan = {
    val spark = SparkSession.active
    val files = Dsv2.listFiles(spark, options.get("path"),
      Dsv2.opt(options, "globFilter", "*.nc"))
    // the EXACT variable-name sets the pushed predicates allow; None = all
    val allowed: Option[Set[String]] = {
      val sets = pushed.collect {
        case EqualTo("variable", v: String) => Set(v)
        case In("variable", vs) => vs.collect { case s: String => s }.toSet
      }
      if (sets.isEmpty) None else Some(sets.reduce(_ intersect _))
    }
    new NetCdfScan(files, Dsv2.confMap(spark), required, allowed,
      Dsv2.opt(options, "decodeCf", "false").toBoolean,
      Dsv2.opt(options, "decodeTimes", "false").toBoolean)
  }
}

private class NetCdfScan(files: Seq[String], conf: Map[String, String],
                         required: StructType, allowed: Option[Set[String]],
                         decodeCf: Boolean, decodeTimes: Boolean)
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def planInputPartitions(): Array[InputPartition] =
    files.map(f => FilePartition(f): InputPartition).toArray
  override def createReaderFactory(): PartitionReaderFactory =
    new NetCdfReaderFactory(conf, required.fieldNames, allowed, decodeCf, decodeTimes)
  override def description(): String =
    s"graft_netcdf vars=${allowed.map(_.toSeq.sorted.mkString("[", ",", "]")).getOrElse("*")}"
}

private class NetCdfReaderFactory(conf: Map[String, String], cols: Array[String],
                                  allowed: Option[Set[String]],
                                  decodeCf: Boolean, decodeTimes: Boolean)
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val path = p.asInstanceOf[FilePartition].path
    val bytes = Dsv2.readBytes(path, conf)
    val wanted: String => Boolean = name => allowed.forall(_.contains(name))
    val rows = NetCdfSource.values(bytes, wanted, decodeCf, decodeTimes)
    val file = UTF8String.fromString(path)
    new PartitionReader[InternalRow] {
      private var i = -1
      override def next(): Boolean = { i += 1; i < rows.length }
      override def get(): InternalRow = {
        val (v, pos, x) = rows(i)
        val values: Array[Any] = cols.map {
          case "file" => file
          case "variable" => UTF8String.fromString(v)
          case "pos" => pos
          case "value" => x
        }
        InternalRow.fromSeq(values.toIndexedSeq)
      }
      override def close(): Unit = ()
    }
  }
}

// ------------------------------------------------------------------ LMDB

/** `spark.read.format("graft.sources.AseLmdbDataSource").option("path", d)`
  * → `db_id STRING, row_id LONG, json STRING`. Pruning `json` away (id
  * lists, counts, resume anti-joins) skips the zlib inflate + UTF-8
  * decode of every value — the scan walks only the key B-tree, the LMDB
  * analogue of not reading data arrays (`_key_filter.py:45`).
  */
class AseLmdbDataSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    AseLmdbDataSource.Schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new AseLmdbTable(properties.asScala.toMap)
}

object AseLmdbDataSource {
  val Schema: StructType = StructType(Seq(
    StructField("db_id", StringType, nullable = false),
    StructField("row_id", LongType, nullable = false),
    StructField("json", StringType, nullable = false)))
}

private class AseLmdbTable(props: Map[String, String]) extends Table with SupportsRead {
  override def name(): String = s"graft_aselmdb(${props.getOrElse("path", "")})"
  override def schema(): StructType = AseLmdbDataSource.Schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new AseLmdbScanBuilder(options)
}

private class AseLmdbScanBuilder(options: CaseInsensitiveStringMap)
    extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = AseLmdbDataSource.Schema
  override def pruneColumns(requiredSchema: StructType): Unit = required = requiredSchema
  override def build(): Scan = {
    val spark = SparkSession.active
    val files = Dsv2.listFiles(spark, options.get("path"),
      Dsv2.opt(options, "globFilter", "*.aselmdb"))
    new AseLmdbScan(files, Dsv2.confMap(spark), required)
  }
}

private class AseLmdbScan(files: Seq[String], conf: Map[String, String],
                          required: StructType) extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def planInputPartitions(): Array[InputPartition] =
    files.map(f => FilePartition(f): InputPartition).toArray
  override def createReaderFactory(): PartitionReaderFactory =
    new AseLmdbReaderFactory(conf, required.fieldNames)
  override def description(): String =
    s"graft_aselmdb ReadSchema: ${required.map(_.name).mkString(",")}"
}

private class AseLmdbReaderFactory(conf: Map[String, String], cols: Array[String])
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val path = p.asInstanceOf[FilePartition].path
    val bytes = Dsv2.readBytes(path, conf)
    val needJson = cols.contains("json")
    val entries = AseLmdbSource.parse(bytes).iterator
      .filter { case (k, _) => !AseLmdbSource.ReservedKeys.contains(k) }
      .flatMap { case (k, v) => k.toLongOption.map(id => (id, v)) }
      .toArray
    val dbId = UTF8String.fromString(path)
    new PartitionReader[InternalRow] {
      private var i = -1
      override def next(): Boolean = { i += 1; i < entries.length }
      override def get(): InternalRow = {
        val (id, v) = entries(i)
        val values: Array[Any] = cols.map {
          case "db_id" => dbId
          case "row_id" => id
          case "json" =>
            // the expensive part — only paid when the query keeps `json`
            val payload =
              if (v.length >= 2 && (v(0) & 0xff) == 0x78) AseLmdbSource.inflate(v)
              else v
            UTF8String.fromString(new String(payload, "UTF-8"))
        }
        InternalRow.fromSeq(values.toIndexedSeq)
      }
      override def close(): Unit = ()
    }
  }
}
