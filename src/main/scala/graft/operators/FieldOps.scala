package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Field-level filters (reference `domains/mesh/filters/field_select.py:61`,
  * `precision.py:94`, `mesh_info.py:94`): projection, recursive downcast, and
  * metadata inventory — all narrow (no shuffle except the info aggregation).
  */
object FieldOps {

  /** FieldSelectFilter: whitelist OR blacklist (both given → error, matching
    * the reference's contract), applied by projection so pruning reaches the
    * scan. Key columns are always kept.
    */
  def fieldSelect(df: DataFrame, keep: Seq[String],
                  include: Seq[String] = Nil, exclude: Seq[String] = Nil): DataFrame = {
    require(include.isEmpty || exclude.isEmpty,
      "fieldSelect: give include OR exclude, not both")
    if (include.nonEmpty) {
      val missing = include.filterNot(df.columns.contains)
      require(missing.isEmpty, s"fieldSelect: unknown fields $missing")
      df.select((keep ++ include).distinct.map(col): _*)
    } else if (exclude.nonEmpty) df.drop(exclude: _*)
    else df
  }

  /** PrecisionFilter: cast every float field to the target type, RECURSING
    * through nested structs and arrays (the reference walks nested
    * TensorDicts, `precision.py:48-91`). Non-float types pass through.
    */
  def precisionCast(df: DataFrame, target: DataType = FloatType): DataFrame = {
    def convert(dt: DataType): DataType = dt match {
      case DoubleType | FloatType => target
      case StructType(fields) =>
        StructType(fields.map(f => f.copy(dataType = convert(f.dataType))))
      case ArrayType(et, n) => ArrayType(convert(et), n)
      case MapType(kt, vt, n) => MapType(kt, convert(vt), n)
      case other => other
    }
    val cols = df.schema.fields.map { f =>
      val converted = convert(f.dataType)
      if (converted == f.dataType) col(f.name)
      else col(f.name).cast(converted).as(f.name)
    }
    df.select(cols.toIndexedSeq: _*)
  }

  /** Column-metadata key carrying a REQUESTED storage precision that Spark
    * itself cannot represent (it has no half types). Format-owning writers
    * (Zarr, NetCDF, HDF5) read the tag and narrow the on-disk dtype.
    */
  val PrecisionKey = "graft.precision"

  /** PrecisionFilter with the reference's full target vocabulary
    * (`precision.py:40-45`: float64/float32/float16/bfloat16). Spark has no
    * half-float type, so `"float16"`/`"bfloat16"` cast to FloatType — the
    * declared in-memory mapping — and stamp the REQUESTED precision into
    * column metadata under [[PrecisionKey]], so a downstream writer can
    * still reproduce the reference's narrow artifact width (ZarrStore
    * honors `float16` as dtype `<f2`). The tag lands on every top-level
    * column whose tree contained a float (nested fields can't carry
    * per-field metadata through a projection).
    */
  def precisionCast(df: DataFrame, targetName: String): DataFrame = {
    val (target, tag) = targetName match {
      case "float64" => (DoubleType, None)
      case "float32" => (FloatType, None)
      case "float16" | "bfloat16" => (FloatType, Some(targetName))
      case other => throw new IllegalArgumentException(
        s"precisionCast: unknown target '$other' " +
          "(float64|float32|float16|bfloat16)")
    }
    def convert(dt: DataType): DataType = dt match {
      case DoubleType | FloatType => target
      case StructType(fields) =>
        StructType(fields.map(f => f.copy(dataType = convert(f.dataType))))
      case ArrayType(et, n) => ArrayType(convert(et), n)
      case MapType(kt, vt, n) => MapType(kt, convert(vt), n)
      case other => other
    }
    val cols = df.schema.fields.map { f =>
      val converted = convert(f.dataType)
      if (converted == f.dataType) col(f.name)
      else tag match {
        case Some(p) =>
          val md = new MetadataBuilder().withMetadata(f.metadata)
            .putString(PrecisionKey, p).build()
          col(f.name).cast(converted).as(f.name, md)
        case None => col(f.name).cast(converted).as(f.name)
      }
    }
    df.select(cols.toIndexedSeq: _*)
  }

  /** The precision a column was tagged with by [[precisionCast]], if any. */
  def requestedPrecision(df: DataFrame, colName: String): Option[String] = {
    val md = df.schema(colName).metadata
    if (md.contains(PrecisionKey)) Some(md.getString(PrecisionKey)) else None
  }

  /** MeshInfoFilter: per-group field inventory (name, type, non-null count,
    * byte estimate) as a JSON-lines-able record — the reference logs this per
    * mesh and appends JSON records (`mesh_info.py:94`).
    */
  def fieldInfo(df: DataFrame, groupCol: String, fields: Seq[String]): DataFrame = {
    val sizes: Map[String, Int] = Map.empty.withDefaultValue(8)
    val aggs = fields.flatMap { f =>
      Seq(count(col(f)).as(s"n_$f"),
        lit(df.schema(f).dataType.simpleString).as(s"type_$f"))
    }
    val allAggs = count(lit(1)).as("n_rows") +: aggs
    val grouped = df.groupBy(col(groupCol)).agg(allAggs.head, allAggs.tail: _*)
    val fieldStructs = array(fields.map { f =>
      struct(lit(f).as("field"), col(s"type_$f").as("dtype"),
        col(s"n_$f").as("n_non_null"),
        (col(s"n_$f") * sizes(f)).as("est_bytes"))
    }: _*)
    grouped.select(col(groupCol), col("n_rows"),
      to_json(fieldStructs).as("fields_json"))
  }
}
