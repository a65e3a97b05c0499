package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** AhmedML dataset source (reference `domains/mesh/sources/ahmedml.py:81` —
  * 500 Ahmed-body CFD runs, one `run_<i>/` directory each holding
  * `boundary_<i>.vtp`, `volume_<i>.vtu`, `ahmed_<i>.stl`, per-plane VTPs
  * under `slices/`,
  * and the CSV metadata `force_mom_<i>.csv` / `force_mom_varref_<i>.csv` /
  * `geo_parameters_<i>.csv`).
  *
  * Mode dispatch mirrors `ahmedml.py:379-394`:
  *  - `boundary` — surface VTP with flow fields → [[readBoundary]]
  *  - `volume` — volumetric VTU (fields live in CellData) → [[readVolume]]
  *  - `slices` — every VTP plane under `slices/` per run → [[readSlices]]
  *  - `multi` — `domain` part ([[readDomain]]: interior point-cloud from
  *    volume cell centroids with cell_data as point_data, boundary surface,
  *    fp32 downcast, `ahmedml.py:620-707,774-889`) and `stl` part
  *    ([[readStl]], `ahmedml.py:709-728`).
  *
  * All modes attach the CSV metadata as global data
  * (`ahmedml.py:527-596`): header names `-`→`_` normalized, the varref
  * file's keys prefixed `varref_`, values float32, missing files skipped.
  *
  * Spark-first shape: each VTK file parses in its own task
  * (`VtkXmlSource.readAll` over a `run_*` glob — the same per-index grain
  * as the reference's worker, scheduled across executors); centroids are a
  * distributed explode→join→agg co-partitioned by mesh, never a driver
  * loop; the CSV scan is one bounded `binaryFile` listing of tiny files.
  * The remote HuggingFace fetch layer (`ahmedml.py:284-312`) plugs in
  * through the [[Fetchers]] seam: every entry point resolves its root
  * URI first, so a local path passes through untouched while `hf://` /
  * `https://` roots stage through the registered backend.
  */
object AhmedMlSource {

  /** Sorted run ids of `run_<i>/` directories (`ahmedml.py:255-282`). */
  def discoverRuns(spark: SparkSession, rootUri: String): Seq[Int] = {
    val root = Fetchers.resolve(spark, rootUri)
    val p = new org.apache.hadoop.fs.Path(root)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(fs.exists(p), s"no such dataset root: $root")
    val re = "run_(\\d+)".r
    val ids = fs.listStatus(p).toSeq.filter(_.isDirectory).flatMap { st =>
      st.getPath.getName match {
        case re(i) => Some(i.toInt)
        case _ => None
      }
    }.sorted
    require(ids.nonEmpty, s"No run_<i>/ directories found at $root")
    ids
  }

  private def runIdOf = regexp_extract(col("mesh_id"), "run_(\\d+)/", 1)
    .cast("long").as("run_id")

  /** Global data `(run_id, key, value float)` from the three CSV templates
    * (`ahmedml.py:527-568`): one header line + one value line per file;
    * `-`→`_` in header names; `force_mom_varref` keys prefixed `varref_`;
    * values float32 (torch.float32 in the reference); a missing file
    * simply contributes no rows.
    */
  def readGlobalData(spark: SparkSession, rootUri: String): DataFrame = {
    val root = Fetchers.resolve(spark, rootUri)
    import spark.implicits._
    val csvRe = "(force_mom_varref|force_mom|geo_parameters)_(\\d+)\\.csv$".r
    spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.csv")
      .load(s"$root/run_*")
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .flatMap { case (path, bytes) =>
        csvRe.findFirstMatchIn(path) match {
          case Some(m) =>
            val kind = m.group(1)
            val run = m.group(2).toLong
            val lines = new String(bytes, "UTF-8").trim.split("\\r?\\n")
            require(lines.length >= 2, s"CSV $path has no value row")
            val headers = lines(0).split(",").map(_.trim.replace("-", "_"))
            val values = lines(1).split(",").map(_.trim.toFloat)
            require(headers.length == values.length,
              s"CSV $path header/value arity mismatch")
            val prefix = if (kind == "force_mom_varref") "varref_" else ""
            headers.zip(values).toSeq.map { case (h, v) => (run, prefix + h, v) }
          case None => Nil
        }
      }.toDF("run_id", "key", "value")
  }

  private def withRun(df: DataFrame, idCols: Seq[String]): DataFrame =
    df.select(runIdOf +: idCols.map(col): _*)

  /** `boundary` mode: surface meshes with flow fields, keyed by run. */
  def readBoundary(spark: SparkSession, rootUri: String,
                   include: Set[String] = Set.empty,
                   exclude: Set[String] = Set.empty): (DataFrame, DataFrame, DataFrame) = {
    val root = Fetchers.resolve(spark, rootUri)
    val (p, c, pd) = VtkXmlSource.read(spark, s"$root/run_*", include, exclude,
      globFilter = "boundary_*.vtp")
    (withRun(p, Seq("point_id", "x", "y", "z")),
      withRun(c, Seq("cell_id", "vertices")),
      withRun(pd, Seq("point_id", "field", "value")))
  }

  /** `volume` mode: volumetric meshes; flow fields live in CellData. */
  def readVolume(spark: SparkSession, rootUri: String,
                 include: Set[String] = Set.empty,
                 exclude: Set[String] = Set.empty): (DataFrame, DataFrame, DataFrame, DataFrame) = {
    val root = Fetchers.resolve(spark, rootUri)
    val (p, c, pd, cd) = VtkXmlSource.readAll(spark, s"$root/run_*", include,
      exclude, globFilter = "volume_*.vtu")
    (withRun(p, Seq("point_id", "x", "y", "z")),
      withRun(c, Seq("cell_id", "vertices")),
      withRun(pd, Seq("point_id", "field", "value")),
      withRun(cd, Seq("cell_id", "field", "value")))
  }

  /** `slices` mode: every VTP plane under `slices/`, one mesh per file
    * (`ahmedml.py:479-523`); `slice_name` is the file stem (the
    * reference's `mesh_name`).
    */
  def readSlices(spark: SparkSession, rootUri: String,
                 include: Set[String] = Set.empty,
                 exclude: Set[String] = Set.empty): (DataFrame, DataFrame, DataFrame) = {
    val root = Fetchers.resolve(spark, rootUri)
    val (p, c, pd) = VtkXmlSource.read(spark, s"$root/run_*/slices", include,
      exclude, globFilter = "*.vtp")
    def named(df: DataFrame, idCols: Seq[String]): DataFrame =
      df.select((runIdOf +:
        regexp_extract(col("mesh_id"), "([^/]+)\\.vtp$", 1).as("slice_name") +:
        idCols.map(col)): _*)
    (named(p, Seq("point_id", "x", "y", "z")),
      named(c, Seq("cell_id", "vertices")),
      named(pd, Seq("point_id", "field", "value")))
  }

  /** The `multi`/`domain` part's tables: interior point-cloud (volume cell
    * centroids carrying the volume's cell data as point data, fp32),
    * boundary surface (fp32), and the CSV global data.
    */
  final case class DomainTables(
      interiorPoints: DataFrame,    // run_id, point_id, x, y, z  (float)
      interiorPointData: DataFrame, // run_id, point_id, field, value (float)
      surfacePoints: DataFrame,     // run_id, point_id, x, y, z  (float)
      surfaceCells: DataFrame,      // run_id, cell_id, vertices
      surfacePointData: DataFrame,  // run_id, point_id, field, value (float)
      globalData: DataFrame)        // run_id, key, value (float)

  /** `multi`/`domain` assembly (`ahmedml.py:620-707`): the interior is the
    * volume VTU reduced to a point-cloud — one point per cell at the cell
    * centroid, the cell's data becoming that point's data — and the
    * boundary VTP is kept whole as the `surface` boundary; both downcast
    * to float32 like the reference's `_downcast_fp32`.
    *
    * Centroids are computed distributed: explode connectivity → join the
    * run's points → mean per cell. Both sides of the join are partitioned
    * by (run, point) so the plan is a plain shuffled hash join + partial
    * agg — no per-run driver work, which is what lets 500 runs × 20 M
    * cells scale out.
    */
  def readDomain(spark: SparkSession, root: String,
                 include: Set[String] = Set.empty,
                 exclude: Set[String] = Set.empty): DomainTables = {
    val (vp, vc, _, vcd) = readVolume(spark, root, include, exclude)
    val verts = vc.select(col("run_id"), col("cell_id"),
      explode(col("vertices")).as("point_id"))
    val interior = verts.join(vp, Seq("run_id", "point_id"))
      .groupBy(col("run_id"), col("cell_id"))
      .agg(avg("x").cast("float").as("x"), avg("y").cast("float").as("y"),
        avg("z").cast("float").as("z"))
      .select(col("run_id"), col("cell_id").as("point_id"),
        col("x"), col("y"), col("z"))
    val interiorData = vcd.select(col("run_id"),
      col("cell_id").as("point_id"), col("field"),
      col("value").cast("float").as("value"))

    val (bp, bc, bpd) = readBoundary(spark, root, include, exclude)
    DomainTables(
      interior,
      interiorData,
      bp.select(col("run_id"), col("point_id"), col("x").cast("float").as("x"),
        col("y").cast("float").as("y"), col("z").cast("float").as("z")),
      bc,
      bpd.select(col("run_id"), col("point_id"), col("field"),
        col("value").cast("float").as("value")),
      readGlobalData(spark, root))
  }

  /** `multi`/`stl` part (`ahmedml.py:709-728`): the run's Ahmed-body STL
    * geometry as (points, cells, cell_data-with-normals), keyed by run.
    */
  def readStl(spark: SparkSession, rootUri: String): (DataFrame, DataFrame, DataFrame) = {
    val root = Fetchers.resolve(spark, rootUri)
    val (p, c, cd) = StlSource.read(spark, s"$root/run_*",
      globFilter = "ahmed_*.stl")
    (withRun(p, Seq("point_id", "x", "y", "z")),
      withRun(c, Seq("cell_id", "vertices", "cell_type")),
      withRun(cd, Seq("cell_id", "field", "value")))
  }

  /** Fixture helper: write one `(header, values)` CSV in the dataset's
    * two-line shape. Driver-side, one tiny file.
    */
  def writeCsv(spark: SparkSession, path: String,
               values: Seq[(String, Double)]): Unit = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val body = values.map(_._1).mkString(",") + "\n" +
      values.map(_._2).mkString(",") + "\n"
    val os = fs.create(p, true)
    try os.write(body.getBytes("UTF-8")) finally os.close()
  }
}
