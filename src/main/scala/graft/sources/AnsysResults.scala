package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Ansys RST result routing (reference `domains/mesh/sources/ansys_rst.py`).
  *
  * The reference does NOT parse `.rst` binaries itself — it drives the
  * ansys-dpf-core service and consumes the arrays it returns. This module
  * implements the same curator-level contract on the Spark side of that
  * boundary: a decoder (DPF or any other) lands raw result rows as a long
  * table `(mesh_id, result, idx, component, value)`, and everything the
  * reference source does with them — result discovery, the known-result
  * nodal/elemental location registry, subset selection, routing into
  * point_data vs cell_data, and per-mesh global metadata — happens here,
  * distributed.
  */
object AnsysResults {

  /** The reference's `_KNOWN_RESULT_TYPES` registry (`ansys_rst.py:70-79`);
    * results absent from it default to nodal, matching
    * `_extract_result_field`.
    */
  val knownResultTypes: Map[String, String] = Map(
    "temperature" -> "nodal",
    "displacement" -> "nodal",
    "heat_flux" -> "elemental",
    "stress" -> "elemental",
    "elastic_strain" -> "elemental",
    "structural_temperature" -> "nodal",
    "velocity" -> "nodal",
    "acceleration" -> "nodal")

  /** Location of a result-name column per the registry (default nodal). */
  def location(result: Column): Column =
    coalesce(element_at(typedLit(knownResultTypes), result), lit("nodal"))

  /** Distinct results present in a decoded mesh with their routing
    * location — the reference's `_discover_available_results`.
    */
  def discover(results: DataFrame): DataFrame =
    results.select(col("result")).distinct()
      .withColumn("location", location(col("result")))

  /** Route decoded result rows into (point_data, cell_data) long tables.
    * Vector results keep their component in the field name
    * (`displacement_0` …); scalars (component null or single) keep the bare
    * result name. `subset` empty = all (the reference's default).
    */
  def route(results: DataFrame, subset: Seq[String] = Nil): (DataFrame, DataFrame) = {
    val filtered =
      if (subset.isEmpty) results
      else results.filter(col("result").isin(subset: _*))
    val named = filtered.withColumn("field",
      when(col("component").isNull, col("result"))
        .otherwise(concat_ws("_", col("result"), col("component"))))
      .withColumn("loc", location(col("result")))
    (named.filter(col("loc") === "nodal")
      .select(col("mesh_id"), col("idx").as("point_id"), col("field"), col("value")),
      named.filter(col("loc") === "elemental")
        .select(col("mesh_id"), col("idx").as("cell_id"), col("field"), col("value")))
  }

  /** Per-mesh global metadata (`num_nodes`, `num_elements`) — the
    * reference's global_data TensorDict, as one row per mesh.
    */
  def globalData(points: DataFrame, cells: DataFrame): DataFrame =
    points.groupBy(col("mesh_id"))
      .agg(count(lit(1)).as("num_nodes"))
      .join(cells.groupBy(col("mesh_id")).agg(count(lit(1)).as("num_elements")),
        Seq("mesh_id"), "left")
      .na.fill(0L, Seq("num_elements"))
}
