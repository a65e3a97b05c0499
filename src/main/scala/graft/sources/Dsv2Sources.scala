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
  def listFiles(spark: SparkSession, path: String, globFilter: String): Seq[String] =
    listFilesWithSize(spark, path, globFilter).map(_._1)

  /** Listing with file sizes — one pass; the sizes feed each Scan's
    * `SupportsReportStatistics` so Catalyst can size broadcast decisions
    * over the custom relations the same way it does over parquet.
    */
  def listFilesWithSize(spark: SparkSession, path: String,
                        globFilter: String): Seq[(String, Long)] = {
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
          val out = ArrayBuffer.empty[(String, Long)]
          while (it.hasNext) {
            val f = it.next()
            if (nameFilter.accept(f.getPath)) out += (f.getPath.toString -> f.getLen)
          }
          out.toSeq
        } else if (nameFilter.accept(st.getPath)) Seq(st.getPath.toString -> st.getLen)
        else Nil
      }
    }.sortBy(_._1)
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

  /** Size-only Statistics for `SupportsReportStatistics`: without it a
    * DSv2 relation defaults to `spark.sql.defaultSizeInBytes` (maxed), so
    * a small pruned mesh side could NEVER broadcast — reporting bytes
    * scaled by the selected-column fraction lets Catalyst make the same
    * join-strategy calls it makes over parquet.
    */
  private[sources] def statsOf(bytes: Long): Statistics = new Statistics {
    override def sizeInBytes: java.util.OptionalLong =
      java.util.OptionalLong.of(math.max(bytes, 1L))
    override def numRows: java.util.OptionalLong = java.util.OptionalLong.empty()
  }

  /** Fraction of a file's payload a pruned schema still reads: selected
    * non-metadata columns over all non-metadata columns (metadata columns
    * are computed, zero payload). Zero data columns → headers only (2%).
    */
  private[sources] def payloadFraction(full: StructType, required: StructType,
                                       meta: Set[String]): Double = {
    val totalData = math.max(full.fieldNames.count(c => !meta.contains(c)), 1)
    val selData = required.fieldNames.count(c => !meta.contains(c))
    if (selData == 0) 0.02 else selData.toDouble / totalData
  }

  /** Bounded-parallel driver-side map for planning-time header reads:
    * schema inference touches only O(header) bytes per file, but at 10⁵
    * files the serial open/read/close latency dominates planning — a
    * fixed pool keeps inference latency ∝ files/16 without unbounded
    * thread growth. Fails fast on the first error (propagated unwrapped).
    */
  private[sources] def parMap[A, B](items: Seq[A], parallelism: Int = 16)(f: A => B): Seq[B] = {
    if (items.length <= 1) return items.map(f)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(
      math.min(parallelism, items.length))
    var failed = false
    try {
      val futures = items.map(a => pool.submit(new java.util.concurrent.Callable[B] {
        override def call(): B = f(a)
      }))
      futures.map { fut =>
        try fut.get()
        catch {
          case e: java.util.concurrent.ExecutionException =>
            failed = true; throw e.getCause
          case e: Throwable => failed = true; throw e
        }
      }
    } finally {
      // On failure, cancel the queued header reads instead of letting them
      // run to completion behind the already-propagated error — at 10⁵-file
      // scale that is real wasted I/O plus lingering non-daemon threads.
      if (failed) pool.shutdownNow() else pool.shutdown()
    }
  }

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
  * vertices ARRAY<LONG>` + one nullable DOUBLE column per CellData array
  * (the AhmedML/DrivAerML volume flow fields, `ahmedml.py:774-883`) —
  * connectivity decodes only when `vertices` is selected, cell arrays
  * only when their columns are.
  */
class VtuDataSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val spark = SparkSession.active
    val files = Dsv2.listFiles(spark, Option(options.get("path")).getOrElse(
      throw new IllegalArgumentException("VtuDataSource requires option 'path'")),
      Dsv2.opt(options, "globFilter", "*.vt[up]"))
    require(files.nonEmpty, s"VtuDataSource: no files under ${options.get("path")}")
    if (Dsv2.opt(options, "table", "points") == "cells") {
      // cells table carries the CellData arrays (AhmedML/DrivAerML volume
      // flow fields live here, `ahmedml.py:774-883`) — header-only reads,
      // same as the points table
      val conf = Dsv2.confMap(spark)
      val limit = Dsv2.opt(options, "inferLimit", "0").toInt
      val sample = if (limit > 0) files.take(limit) else files
      val arrays = Dsv2.parMap(sample) { f =>
        val raw = new Dsv2.HadoopRawData(f, conf)
        try VtkXmlSource.listVtuArraysRaw(raw)._4 finally raw.close()
      }.flatten.distinct.sorted
      StructType(Seq(
        StructField("mesh_id", StringType, nullable = false),
        StructField("cell_id", LongType, nullable = false),
        StructField("vertices", ArrayType(LongType), nullable = false)) ++
        arrays.map(a => StructField(a, DoubleType, nullable = true)))
    } else {
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
      val arrays = Dsv2.parMap(sample) { f =>
        val raw = new Dsv2.HadoopRawData(f, conf)
        try VtkXmlSource.listVtuArraysRaw(raw)._3 finally raw.close()
      }.flatten.distinct.sorted
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
    val files = Dsv2.listFilesWithSize(spark, options.get("path"),
      Dsv2.opt(options, "globFilter", "*.vt[up]"))
    val cells = Dsv2.opt(options, "table", "points") == "cells"
    val frac =
      if (cells) 0.2 // connectivity is a small slice of a typical mesh file
      else Dsv2.payloadFraction(full, required, Set("mesh_id", "point_id"))
    new VtuScan(files.map(_._1), (files.map(_._2).sum * frac).toLong,
      Dsv2.confMap(spark), required, cells)
  }
}

private case class FilePartition(path: String) extends InputPartition

private class VtuScan(files: Seq[String], estBytes: Long,
                      conf: Map[String, String],
                      required: StructType, cellsTable: Boolean)
    extends Scan with Batch with SupportsReportStatistics {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def estimateStatistics(): Statistics = Dsv2.statsOf(estBytes)
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
      val meta = Seq("mesh_id", "cell_id", "vertices")
      val arrays = cols.filterNot(meta.contains)
      val needCells = cols.contains("vertices")
      val (cells, decoded, n) =
        try {
          val piece = VtkXmlSource.parseVtuRaw(raw, include = arrays.toSet,
            decodePoints = false, decodeCells = needCells,
            decodePointData = arrays.nonEmpty)
          val rows: Long =
            if (needCells) piece.cells.length.toLong
            else piece.cellData.values.headOption.map(_.length.toLong).getOrElse {
              val listed = VtkXmlSource.listVtuArraysRaw(raw)._2
              require(listed >= 0,
                s"$path: no decoded array and no NumberOfCells attribute to count rows")
              listed
            }
          (piece.cells, piece.cellData, rows)
        } finally raw.close()
      new PartitionReader[InternalRow] {
        private var i = -1L
        override def next(): Boolean = { i += 1; i < n }
        override def get(): InternalRow = {
          val values: Array[Any] = cols.map {
            case "mesh_id" => meshId
            case "cell_id" => i
            case "vertices" => new GenericArrayData(cells(i.toInt))
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
    val files = Dsv2.listFilesWithSize(spark, options.get("path"),
      Dsv2.opt(options, "globFilter", "*.nc"))
    // the EXACT variable-name sets the pushed predicates allow; None = all
    val allowed: Option[Set[String]] = {
      val sets = pushed.collect {
        case EqualTo("variable", v: String) => Set(v)
        case In("variable", vs) => vs.collect { case s: String => s }.toSet
      }
      if (sets.isEmpty) None else Some(sets.reduce(_ intersect _))
    }
    // one .nc per variable is the sink layout; a variable filter therefore
    // bounds bytes by the matching files (here: coarse whole-listing sum —
    // the planner only needs the broadcastability order of magnitude)
    new NetCdfScan(files.map(_._1), files.map(_._2).sum,
      Dsv2.confMap(spark), required, allowed,
      Dsv2.opt(options, "decodeCf", "false").toBoolean,
      Dsv2.opt(options, "decodeTimes", "false").toBoolean)
  }
}

private class NetCdfScan(files: Seq[String], estBytes: Long,
                         conf: Map[String, String],
                         required: StructType, allowed: Option[Set[String]],
                         decodeCf: Boolean, decodeTimes: Boolean)
    extends Scan with Batch with SupportsReportStatistics {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def estimateStatistics(): Statistics = Dsv2.statsOf(estBytes)
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
    // ranged handle: a pushed variable predicate prunes I/O — a file with
    // no wanted variable costs only its header bytes, and wanted variables
    // read as slices at their CDF begin offsets
    val raw = new Dsv2.HadoopRawData(path, conf)
    val wanted: String => Boolean = name => allowed.forall(_.contains(name))
    // toArray: the decoder returns a List, and positional List access in
    // the row loop is O(n²) — quadratic at real grid sizes
    val rows =
      try NetCdfSource.valuesRanged(raw, wanted, decodeCf, decodeTimes).toArray
      finally raw.close()
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
    val files = Dsv2.listFilesWithSize(spark, options.get("path"),
      Dsv2.opt(options, "globFilter", "*.aselmdb"))
    // json pruned away → only the key B-tree is walked (a small slice)
    val frac = if (required.fieldNames.contains("json")) 1.0 else 0.1
    new AseLmdbScan(files.map(_._1), (files.map(_._2).sum * frac).toLong,
      Dsv2.confMap(spark), required)
  }
}

private class AseLmdbScan(files: Seq[String], estBytes: Long,
                          conf: Map[String, String],
                          required: StructType)
    extends Scan with Batch with SupportsReportStatistics {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def estimateStatistics(): Statistics = Dsv2.statsOf(estBytes)
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
    val needJson = cols.contains("json")
    // ranged page walk: with `json` pruned away the B-tree skeleton is
    // all that's read — F_BIGDATA overflow pages (where ASE's large
    // compressed rows live) never move off disk
    val raw = new Dsv2.HadoopRawData(path, conf)
    val entries =
      try AseLmdbSource.parseAllRanged(raw, needValues = needJson).iterator
        .collect { case AseLmdbSource.LmdbEntry("", k, v) => (k, v) }
        .filter { case (k, _) => !AseLmdbSource.ReservedKeys.contains(k) }
        .flatMap { case (k, v) => k.toLongOption.map(id => (id, v)) }
        .toArray
      finally raw.close()
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

// ------------------------------------------------------------------ VTI

/** `spark.read.format("graft.sources.VtiDataSource").option("path", dir)`.
  *
  * Default table (`table=points`): `grid_id STRING, i/j/k INT,
  * x/y/z DOUBLE` + one nullable DOUBLE column per PointData array found
  * across the globbed `.vti` files — the dense x-fastest point lattice
  * (reference `sources/vti.py:100-143`). `option("table", "cells")` is the
  * cell lattice (`(nx-1)(ny-1)(nz-1)` cells, coordinates at cell centers)
  * carrying the CellData arrays.
  *
  * Pruning semantics mirror [[VtuDataSource]]: unselected arrays are never
  * payload-read (ranged reads into the appended block), lattice indices and
  * coordinates are COMPUTED from the header's extent/origin/spacing (zero
  * payload), and schema inference reads only XML headers.
  */
class VtiDataSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val spark = SparkSession.active
    val files = Dsv2.listFiles(spark, Option(options.get("path")).getOrElse(
      throw new IllegalArgumentException("VtiDataSource requires option 'path'")),
      Dsv2.opt(options, "globFilter", "*.vti"))
    require(files.nonEmpty, s"VtiDataSource: no files under ${options.get("path")}")
    val conf = Dsv2.confMap(spark)
    val cellsTable = Dsv2.opt(options, "table", "points") == "cells"
    val limit = Dsv2.opt(options, "inferLimit", "0").toInt
    val sample = if (limit > 0) files.take(limit) else files
    val arrays = Dsv2.parMap(sample) { f =>
      val raw = new Dsv2.HadoopRawData(f, conf)
      try {
        val (_, _, _, pd, cd) = VtkXmlSource.listVtiMeta(raw)
        if (cellsTable) cd else pd
      } finally raw.close()
    }.flatten.distinct.sorted
    StructType(
      Seq(StructField("grid_id", StringType, nullable = false),
        StructField("i", IntegerType, nullable = false),
        StructField("j", IntegerType, nullable = false),
        StructField("k", IntegerType, nullable = false),
        StructField("x", DoubleType, nullable = false),
        StructField("y", DoubleType, nullable = false),
        StructField("z", DoubleType, nullable = false)) ++
        arrays.map(a => StructField(a, DoubleType, nullable = true)))
  }

  override def supportsExternalMetadata(): Boolean = true

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new VtiTable(schema, properties.asScala.toMap)
}

private class VtiTable(schema0: StructType, props: Map[String, String])
    extends Table with SupportsRead {
  override def name(): String = s"graft_vti(${props.getOrElse("path", "")})"
  override def schema(): StructType = schema0
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new VtiScanBuilder(schema0, options)
}

private class VtiScanBuilder(full: StructType, options: CaseInsensitiveStringMap)
    extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = full
  override def pruneColumns(requiredSchema: StructType): Unit = required = requiredSchema
  override def build(): Scan = {
    val spark = SparkSession.active
    val files = Dsv2.listFilesWithSize(spark, options.get("path"),
      Dsv2.opt(options, "globFilter", "*.vti"))
    // i/j/k/x/y/z are COMPUTED from the header (zero payload)
    val frac = Dsv2.payloadFraction(full, required,
      Set("grid_id", "i", "j", "k", "x", "y", "z"))
    new VtiScan(files.map(_._1), (files.map(_._2).sum * frac).toLong,
      Dsv2.confMap(spark), required,
      Dsv2.opt(options, "table", "points") == "cells")
  }
}

private class VtiScan(files: Seq[String], estBytes: Long,
                      conf: Map[String, String],
                      required: StructType, cellsTable: Boolean)
    extends Scan with Batch with SupportsReportStatistics {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def estimateStatistics(): Statistics = Dsv2.statsOf(estBytes)
  override def planInputPartitions(): Array[InputPartition] =
    files.map(f => FilePartition(f): InputPartition).toArray
  override def createReaderFactory(): PartitionReaderFactory =
    new VtiReaderFactory(conf, required.fieldNames, cellsTable)
  override def description(): String =
    s"graft_vti ReadSchema: ${required.map(_.name).mkString(",")}"
}

private class VtiReaderFactory(conf: Map[String, String], cols: Array[String],
                               cellsTable: Boolean)
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val path = p.asInstanceOf[FilePartition].path
    val raw = new Dsv2.HadoopRawData(path, conf)
    val meta = Seq("grid_id", "i", "j", "k", "x", "y", "z")
    val arrays = cols.filterNot(meta.contains)
    val (extent, origin, spacing, decoded) =
      try {
        val (ext, org0, spc, _, _) = VtkXmlSource.listVtiMeta(raw)
        val d: Map[String, Array[Double]] =
          if (arrays.isEmpty) Map.empty
          else {
            val g = VtkXmlSource.parseVtiRaw(raw, include = arrays.toSet)
            if (cellsTable) g.cellData else g.pointData
          }
        (ext, org0, spc, d)
      } finally raw.close()
    val nx = extent(1) - extent(0) + 1
    val ny = extent(3) - extent(2) + 1
    val nz = extent(5) - extent(4) + 1
    // cell lattice dims (a flat axis keeps one layer, as in readVti)
    val off = if (cellsTable) 1 else 0
    val dx = math.max(nx - off, 1); val dy = math.max(ny - off, 1)
    val dz = math.max(nz - off, 1)
    val shift = if (cellsTable) 0.5 else 0.0
    val n = dx.toLong * dy * dz
    val gridId = UTF8String.fromString(path)
    new PartitionReader[InternalRow] {
      private var idx = -1L
      override def next(): Boolean = { idx += 1; idx < n }
      override def get(): InternalRow = {
        val i = (idx % dx).toInt
        val j = ((idx / dx) % dy).toInt
        val k = (idx / (dx.toLong * dy)).toInt
        val values: Array[Any] = cols.map {
          case "grid_id" => gridId
          case "i" => extent(0) + i
          case "j" => extent(2) + j
          case "k" => extent(4) + k
          case "x" => origin(0) + (extent(0) + i + shift) * spacing(0)
          case "y" => origin(1) + (extent(2) + j + shift) * spacing(1)
          case "z" => origin(2) + (extent(4) + k + shift) * spacing(2)
          case a =>
            decoded.get(a) match {
              case Some(vs) if idx < vs.length => vs(idx.toInt)
              case _ => null
            }
        }
        InternalRow.fromSeq(values.toIndexedSeq)
      }
      override def close(): Unit = ()
    }
  }
}

// --------------------------------------------------------------- d3plot

/** `spark.read.format("graft.sources.D3PlotDataSource").option("path", g)`
  * over LS-DYNA d3plot families (root + `d3plot01…` continuations grouped
  * per directory, numerically ordered — the same family rule as
  * `D3PlotSource.read`). `option("table", ...)` picks the long model:
  *
  *  - `points` (default): `mesh_id, point_id, x, y, z`
  *  - `cells`:  `mesh_id, cell_id, vertices, part_id, cell_type`
  *  - `states`: `mesh_id, t, time, point_id, dx, dy, dz`
  *  - `shell`:  `mesh_id, t, cell_id, layer, sx..tzx, epsp`
  *
  * The table choice maps onto [[D3PlotSource.D3Select]] block pruning: a
  * `states` scan never materializes geometry or shell stress, a `shell`
  * scan never materializes node vectors — the state walker advances at the
  * documented per-block strides (`d3plot.py:334` analogue). Schemas are
  * static, so planning reads zero file bytes.
  */
class D3PlotDataSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    D3PlotDataSource.schemaOf(Dsv2.opt(options, "table", "points"))
  override def supportsExternalMetadata(): Boolean = true
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new D3PlotTable(schema, properties.asScala.toMap)
}

object D3PlotDataSource {
  private def s(n: String) = StructField(n, StringType, nullable = false)
  private def l(n: String) = StructField(n, LongType, nullable = false)
  private def i(n: String) = StructField(n, IntegerType, nullable = false)
  private def d(n: String) = StructField(n, DoubleType, nullable = false)
  def schemaOf(table: String): StructType = table match {
    case "points" => StructType(Seq(s("mesh_id"), l("point_id"), d("x"), d("y"), d("z")))
    case "cells" => StructType(Seq(s("mesh_id"), l("cell_id"),
      StructField("vertices", ArrayType(LongType), nullable = false),
      l("part_id"), i("cell_type")))
    case "states" => StructType(Seq(s("mesh_id"), i("t"), d("time"),
      l("point_id"), d("dx"), d("dy"), d("dz")))
    case "shell" => StructType(Seq(s("mesh_id"), i("t"), l("cell_id"), i("layer"),
      d("sx"), d("sy"), d("sz"), d("txy"), d("tyz"), d("tzx"), d("epsp")))
    case other => throw new IllegalArgumentException(
      s"unknown d3plot table '$other' (points|cells|states|shell)")
  }

  /** Driver-side family grouping: per directory, `d3plotNN` continuations
    * (numeric order) belong to the bare `d3plot` root; any other matching
    * file is an independent root. Mirrors `D3PlotSource.parsedFamilies`.
    */
  private[sources] def families(files: Seq[String]): Seq[(String, Seq[String])] = {
    def base(p: String) = p.split("/").last
    files.groupBy(_.replaceAll("/[^/]*$", "")).toSeq.sortBy(_._1).flatMap {
      case (dir, fs) =>
        val (conts, roots) = fs.partition(f => base(f).matches("d3plot\\d+"))
        val sortedConts = conts.sortBy(f => base(f).drop("d3plot".length).toInt)
        val (familyRoot, soloRoots) = roots.partition(f => base(f) == "d3plot")
        require(sortedConts.isEmpty || familyRoot.nonEmpty,
          s"$dir has continuation files ${sortedConts.map(base)} but no d3plot root")
        familyRoot.map(r => (r, sortedConts)) ++ soloRoots.sorted.map(r => (r, Nil))
    }
  }
}

private class D3PlotTable(schema0: StructType, props: Map[String, String])
    extends Table with SupportsRead {
  override def name(): String = s"graft_d3plot(${props.getOrElse("path", "")})"
  override def schema(): StructType = schema0
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new D3PlotScanBuilder(schema0, options)
}

private class D3PlotScanBuilder(full: StructType, options: CaseInsensitiveStringMap)
    extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = full
  override def pruneColumns(requiredSchema: StructType): Unit = required = requiredSchema
  override def build(): Scan = {
    val spark = SparkSession.active
    val files = Dsv2.listFilesWithSize(spark, options.get("path"),
      Dsv2.opt(options, "globFilter", "*d3plot*"))
    new D3PlotScan(D3PlotDataSource.families(files.map(_._1)),
      files.map(_._2).sum, Dsv2.confMap(spark),
      required, Dsv2.opt(options, "table", "points"))
  }
}

private case class D3FamilyPartition(root: String, conts: Seq[String])
    extends InputPartition

private class D3PlotScan(fams: Seq[(String, Seq[String])], estBytes: Long,
                         conf: Map[String, String],
                         required: StructType, table: String)
    extends Scan with Batch with SupportsReportStatistics {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def estimateStatistics(): Statistics = Dsv2.statsOf(estBytes)
  override def planInputPartitions(): Array[InputPartition] =
    fams.map { case (r, c) => D3FamilyPartition(r, c): InputPartition }.toArray
  override def createReaderFactory(): PartitionReaderFactory =
    new D3PlotReaderFactory(conf, required.fieldNames, table)
  override def description(): String =
    s"graft_d3plot table=$table ReadSchema: ${required.map(_.name).mkString(",")}"
}

private class D3PlotReaderFactory(conf: Map[String, String], cols: Array[String],
                                  table: String)
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val fam = p.asInstanceOf[D3FamilyPartition]
    val sel = table match {
      case "points" | "cells" =>
        D3PlotSource.D3Select(geometry = true, nodeVec = false, shell = false, sph = false)
      case "states" =>
        D3PlotSource.D3Select(geometry = false, nodeVec = true, shell = false, sph = false)
      case "shell" =>
        D3PlotSource.D3Select(geometry = false, nodeVec = false, shell = true, sph = false)
    }
    val geometryOnly = table == "points" || table == "cells"
    val f =
      if (geometryOnly) {
        // the geometry sits entirely before the first state: pread just
        // that prefix of the root and skip every continuation file
        // (continuations are state payload only)
        val raw = new Dsv2.HadoopRawData(fam.root, conf)
        val rootBytes =
          try {
            val head = raw.slice(0L, math.min(raw.size, 64L << 10))
            raw.slice(0L, math.min(raw.size,
              D3PlotSource.geometryByteLength(head)))
          } finally raw.close()
        D3PlotSource.parseFamily(rootBytes, Nil, sel)
      } else
        D3PlotSource.parseFamily(Dsv2.readBytes(fam.root, conf),
          fam.conts.map(Dsv2.readBytes(_, conf)), sel)
    val meshId = UTF8String.fromString(fam.root)
    val rows: Iterator[Array[Any]] = table match {
      case "points" =>
        f.coords.iterator.zipWithIndex.map { case (c, n) =>
          cols.map[Any] {
            case "mesh_id" => meshId
            case "point_id" => n.toLong
            case "x" => c(0).toDouble
            case "y" => c(1).toDouble
            case "z" => c(2).toDouble
          }
        }
      case "cells" =>
        val solids = f.solids.iterator.zipWithIndex.map { case ((vs, part), e) =>
          (e.toLong, vs, part, 12)
        }
        val shells = f.shells.iterator.zipWithIndex.map { case ((vs, part), e) =>
          ((f.solids.length + e).toLong, vs, part, 9)
        }
        (solids ++ shells).map { case (cellId, vs, part, tpe) =>
          cols.map[Any] {
            case "mesh_id" => meshId
            case "cell_id" => cellId
            case "vertices" => new GenericArrayData(vs)
            case "part_id" => part
            case "cell_type" => tpe
          }
        }
      case "states" =>
        f.states.iterator.zipWithIndex.flatMap { case (st, t) =>
          st.nodeVec.iterator.zipWithIndex.map { case (v, n) =>
            cols.map[Any] {
              case "mesh_id" => meshId
              case "t" => t
              case "time" => st.time.toDouble
              case "point_id" => n.toLong
              case "dx" => v(0).toDouble
              case "dy" => v(1).toDouble
              case "dz" => v(2).toDouble
            }
          }
        }
      case "shell" =>
        val nSolids = f.numSolids
        f.states.iterator.zipWithIndex.flatMap { case (st, t) =>
          st.shellStress.iterator.zipWithIndex.flatMap { case (layers, e) =>
            layers.iterator.zipWithIndex.map { case (sv, l) =>
              cols.map[Any] {
                case "mesh_id" => meshId
                case "t" => t
                case "cell_id" => (nSolids + e).toLong
                case "layer" => l
                case "sx" => sv(0).toDouble
                case "sy" => sv(1).toDouble
                case "sz" => sv(2).toDouble
                case "txy" => sv(3).toDouble
                case "tyz" => sv(4).toDouble
                case "tzx" => sv(5).toDouble
                case "epsp" => st.shellEpsp(e)(l).toDouble
              }
            }
          }
        }
    }
    new PartitionReader[InternalRow] {
      private var cur: InternalRow = _
      override def next(): Boolean = {
        if (rows.hasNext) { cur = InternalRow.fromSeq(rows.next().toIndexedSeq); true }
        else false
      }
      override def get(): InternalRow = cur
      override def close(): Unit = ()
    }
  }
}
