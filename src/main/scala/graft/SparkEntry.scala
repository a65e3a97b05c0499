package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Physics
import graft.operators.{RelationalOps, StatsOps}
import graft.sources.Tables

/** Driver contract — one `queries` entry per implemented operator from
  * SURVEY.md §2, with a DuckDB-equivalent `oracleSql` for the t2 hash check.
  *
  * Conventions for oracle parity:
  *  - every computed float column is rounded identically on both sides
  *    (rounding width ≫ worst-case summation-order error);
  *  - counts/sums of integers are CAST to BIGINT in SQL (DuckDB sums to
  *    HUGEINT otherwise);
  *  - both sides ORDER BY the key columns;
  *  - aggregate aliases match exactly (driver sorts columns by name).
  */
object SparkEntry {

  /** Epsilon-stabilized rounding for oracle float parity. Aggregates of
    * 2-decimal inputs often terminate *exactly* on a rounding half-boundary
    * (e.g. var = 114.87585), where Spark (BigDecimal HALF_UP) and DuckDB
    * (scale + rint) disagree. A tiny epsilon — far above algorithmic
    * summation-order noise, far below the rounding width — pushes exact halves
    * consistently off the boundary. The identical `+ eps` appears in every
    * oracleSql round().
    */
  private def rnd(c: org.apache.spark.sql.Column, d: Int): org.apache.spark.sql.Column =
    round(c + lit(if (d <= 2) 1e-6 else 1e-9), d)
  private def rnd(name: String, d: Int): org.apache.spark.sql.Column = rnd(col(name), d)

  /** Flagship: regional-revenue 5-table join (NS-cylinder join shape,
    * reference `domains/mesh/sources/ns_cylinder.py:17-40`) on sf0.001.
    */
  def entry(spark: SparkSession): DataFrame =
    qJoinRegionalRevenue(spark, "/root/testdata/sf0.001")

  // ---------------------------------------------------------------- queries

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_mean_filter" -> (qMeanFilter _),
    "q_field_stats" -> (qFieldStats _),
    "q_welford_state" -> (qWelfordState _),
    "q_join_regional_revenue" -> (qJoinRegionalRevenue _),
    "q_semi_customers_with_orders" -> (qSemiCustomersWithOrders _),
    "q_anti_customers_without_orders" -> (qAntiCustomersWithoutOrders _),
    "q_distinct_edges" -> (qDistinctEdges _),
    "q_keep_first_dedup" -> (qKeepFirstDedup _),
    "q_permutation_ids" -> (qPermutationIds _),
    "q_window_lag_delta" -> (qWindowLagDelta _),
    "q_pivot_event_matrix" -> (qPivotEventMatrix _),
    "q_grid_stats" -> (qGridStats _),
    "q_year_partition_counts" -> (qYearPartitionCounts _),
    "q_nan_inf_census" -> (qNanInfCensus _),
    "q_von_mises" -> (qVonMises _),
    "q_precision_cast" -> (qPrecisionCast _),
    "q_field_select_pushdown" -> (qFieldSelectPushdown _),
    "q_global_inject" -> (qGlobalInject _),
    "q_array_explode" -> (qArrayExplode _),
    "q_point_to_cell_mean" -> (qPointToCellMean _),
    "q_json_extract" -> (qJsonExtract _),
  )

  /** MeanFilter (`domains/mesh/filters/mean.py:42`): per-group mean of every
    * field — one shuffle, partial+final hash agg.
    */
  private def qMeanFilter(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        count(lit(1)).as("n_rows"),
        rnd(avg("l_quantity"), 4).as("mean_qty"),
        rnd(avg("l_extendedprice"), 4).as("mean_price"),
        rnd(avg("l_discount"), 6).as("mean_disc"),
        rnd(avg("l_tax"), 6).as("mean_tax"))
      .orderBy("l_returnflag", "l_linestatus")

  /** MeshStatsFilter (`domains/mesh/filters/stats.py:232`): full stats family
    * per field over the long (field, value) layout.
    */
  private def qFieldStats(s: SparkSession, dir: String): DataFrame = {
    val long = StatsOps.toLong(Tables.lineitem(s, dir),
      Seq("l_quantity", "l_discount", "l_tax"))
    StatsOps.fieldStats(long)
      .select(col("field"), col("n"),
        rnd(col("mean"), 4).as("mean"),
        rnd(col("var_pop"), 4).as("var_pop"),
        rnd(col("std_pop"), 4).as("std_pop"),
        rnd(col("min"), 4).as("min"),
        rnd(col("max"), 4).as("max"),
        rnd(col("median"), 4).as("median"),
        rnd(col("abs_mean"), 4).as("abs_mean"),
        rnd(col("abs_max"), 4).as("abs_max"),
        rnd(col("skew"), 4).as("skew"),
        rnd(col("kurt"), 4).as("kurt"))
      .orderBy("field")
  }

  /** Welford mergeable-state emission (`stats.py:675-836`) via the custom
    * Chan-merge Aggregator; central moments normalized by n for float-stable
    * oracle comparison.
    */
  private def qWelfordState(s: SparkSession, dir: String): DataFrame = {
    val long = StatsOps.toLong(Tables.lineitem(s, dir),
      Seq("l_quantity", "l_discount", "l_tax"))
    StatsOps.welfordState(long, Seq("field"), "value")
      .select(col("field"), col("n"),
        rnd(col("mean"), 6).as("mean"),
        rnd(col("m2") / col("n"), 4).as("mom2"),
        rnd(col("m3") / col("n"), 4).as("mom3"),
        rnd(col("m4") / col("n"), 3).as("mom4"),
        rnd(col("min"), 4).as("min"),
        rnd(col("max"), 4).as("max"),
        rnd(col("abs_sum") / col("n"), 6).as("abs_mean"))
      .orderBy("field")
  }

  /** NS-cylinder join shape (`ns_cylinder.py:17-40`): fact ⋈ fact ⋈ dim with
    * broadcast small dims — lineitem ⋈ orders ⋈ customer ⋈ B(nation) ⋈ B(region).
    */
  private def qJoinRegionalRevenue(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(s, dir)), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(s, dir)), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(
        count(lit(1)).as("n_items"),
        rnd(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("revenue"))
      .orderBy("r_name", "n_name")

  /** CleanFilter referenced-only semantics (`clean.py:39`) / checkpoint-skip
    * shape: left-semi join.
    */
  private def qSemiCustomersWithOrders(s: SparkSession, dir: String): DataFrame =
    Tables.customer(s, dir)
      .join(Tables.orders(s, dir).select(col("o_custkey").as("c_custkey")),
        Seq("c_custkey"), "left_semi")
      .select("c_custkey", "c_mktsegment", "c_acctbal")
      .orderBy("c_custkey")

  /** Checkpoint-resume remaining-work (`core/base.py:595-602`): work-list
    * anti-joined against the completed ledger (here: customers minus those
    * with an urgent order).
    */
  private def qAntiCustomersWithoutOrders(s: SparkSession, dir: String): DataFrame =
    RelationalOps.remaining(
      Tables.customer(s, dir),
      Tables.orders(s, dir).filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_custkey").as("c_custkey")),
      "c_custkey")
      .select("c_custkey", "c_mktsegment", "c_acctbal")
      .orderBy("c_custkey")

  /** EdgeComputeFilter (`edge_compute.py:40`): canonical distinct edge set. */
  private def qDistinctEdges(s: SparkSession, dir: String): DataFrame =
    RelationalOps.canonicalEdges(Tables.lineitem(s, dir), "l_partkey", "l_suppkey")
      .orderBy("edge_a", "edge_b")

  /** CleanFilter duplicate-removal keep-first (`clean.py:39`). */
  private def qKeepFirstDedup(s: SparkSession, dir: String): DataFrame =
    RelationalOps.keepFirst(Tables.lineitem(s, dir),
      Seq("l_partkey", "l_suppkey"), "l_orderkey")
      .orderBy("l_partkey", "l_suppkey")

  /** RandomPermutationFilter id reassignment (`random_permutation.py:83-139`). */
  private def qPermutationIds(s: SparkSession, dir: String): DataFrame =
    RelationalOps.reassignIds(
      Tables.lineitem(s, dir).select("l_returnflag", "l_orderkey", "l_linenumber"),
      Seq("l_returnflag"), Seq(col("l_orderkey"), col("l_linenumber")))
      .filter(col("new_id") <= 100)
      .orderBy("l_returnflag", "new_id")

  /** Pivoted-timestep flattening as long-format lag (`SURVEY §2.6`):
    * per-entity ordered delta via window lag.
    */
  private def qWindowLagDelta(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    Tables.events(s, dir)
      .select(col("user_id"), col("event_id"),
        rnd(col("value") - lag(col("value"), 1).over(w), 2).as("delta"))
      .orderBy("user_id", "event_id")
  }

  /** Displacement-timestep pivot (`mesh_zarr.py:105`): wide per-key matrix. */
  private def qPivotEventMatrix(s: SparkSession, dir: String): DataFrame = {
    val types = Seq("click", "error", "purchase", "signup", "view")
    val pivoted = Tables.events(s, dir)
      .groupBy(col("user_id"))
      .pivot("event_type", types)
      .agg(sum(col("value")))
    pivoted.select(col("user_id") +: types.map(t => rnd(col(t), 2).as(t)): _*)
      .orderBy("user_id")
  }

  /** DataArrayStatsFilter (`domains/da/filters/stats.py:47`): grouped moments
    * with time reduced into (variable, hour) grid cells.
    */
  private def qGridStats(s: SparkSession, dir: String): DataFrame = {
    val obs = Tables.events(s, dir)
      .withColumn("hour", date_trunc("hour", col("ts")))
    StatsOps.gridStats(obs, Seq("event_type", "hour"), "value")
      .select(col("event_type"), col("hour"), col("n"),
        rnd(col("mean"), 4).as("mean"),
        rnd(col("var_pop"), 4).as("var_pop"),
        col("min"), col("max"))
      .orderBy("event_type", "hour")
  }

  /** NetCDF4Sink year-split layout (`netcdf_writer.py:55-74`): the partition
    * keys (variable, year) and their contents.
    */
  private def qYearPartitionCounts(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(col("event_type"), year(col("ts")).as("yr"))
      .agg(count(lit(1)).as("n"), rnd(sum("value"), 2).as("sum_value"))
      .orderBy("event_type", "yr")

  /** MeshQualityFilter NaN/Inf/null census (`quality.py:693`). */
  private def qNanInfCensus(s: SparkSession, dir: String): DataFrame =
    StatsOps.nanInfCensus(Tables.lineitem(s, dir),
      Seq("l_quantity", "l_extendedprice", "l_discount"))

  /** Von Mises stress kernel (Rust `d3plot/stress.rs:30`) as pure column
    * arithmetic, aggregated per group.
    */
  private def qVonMises(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
    val vm = Physics.vonMises(
      col("l_quantity"), col("l_extendedprice") / 1000.0, col("l_discount") * 100.0,
      col("l_tax") * 10.0, col("l_linenumber").cast("double"), col("l_quantity") / 2.0)
    li.withColumn("vm", vm)
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"),
        rnd(avg("vm"), 4).as("vm_mean"),
        rnd(min("vm"), 4).as("vm_min"),
        rnd(max("vm"), 4).as("vm_max"))
      .orderBy("l_returnflag")
  }

  /** PrecisionFilter (`precision.py:94`): float64 → float32 downcast. */
  private def qPrecisionCast(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .select(col("l_orderkey"), col("l_linenumber"),
        col("l_extendedprice").cast("float").as("price_f32"),
        col("l_discount").cast("float").as("disc_f32"))
      .orderBy("l_orderkey", "l_linenumber")

  /** FieldSelectFilter + reader-level pruning (`field_select.py:61`,
    * `_key_filter.py:45`): projection + predicate, both pushed to the scan.
    */
  private def qFieldSelectPushdown(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .filter(col("l_shipdate") < to_timestamp(lit("1996-07-01")) &&
        col("l_discount") > 0.05)
      .select("l_orderkey", "l_shipdate")
      .orderBy("l_orderkey", "l_shipdate")

  /** GlobalDataFilter (`global_data.py:51`): constant + derived globals
    * broadcast onto every row.
    */
  private def qGlobalInject(s: SparkSession, dir: String): DataFrame = {
    val g = Tables.supplier(s, dir).agg(rnd(avg("s_acctbal"), 4).as("s_avg"))
    RelationalOps.injectGlobals(
      Tables.customer(s, dir).select("c_custkey", "c_acctbal"),
      Map("rho_inf" -> 1.225), Some(g))
      .orderBy("c_custkey")
  }

  /** TensorDict field flattening (`stats.py:107-138`): array column → long
    * (id, pos, value) via posexplode.
    */
  private def qArrayExplode(s: SparkSession, dir: String): DataFrame =
    Tables.embeddings(s, dir)
      .select(col("vec_id"), posexplode(col("embedding")).as(Seq("pos0", "val")))
      .select(col("vec_id"), (col("pos0") + 1).as("pos"),
        col("val").cast("double").as("val"))
      .orderBy("vec_id", "pos")

  /** PointDataToCellDataFilter (`point_data_to_cell.py:39`): vertex values
    * averaged onto their cell — explode + groupBy(cell).
    */
  private def qPointToCellMean(s: SparkSession, dir: String): DataFrame =
    Tables.embeddings(s, dir)
      .select(col("vec_id"), col("label"), explode(col("embedding")).as("v"))
      .groupBy(col("vec_id"), col("label"))
      .agg(count(lit(1)).as("n_vertices"),
        rnd(avg(col("v").cast("double")), 6).as("cell_mean"))
      .orderBy("vec_id")

  /** JSON detail-column extraction (`quality.py:72` uses JSON payloads):
    * get_json_object + aggregation.
    */
  private def qJsonExtract(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .withColumn("k", get_json_object(col("props"), "$.k").cast("int"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum("k").as("sum_k"),
        rnd(avg("k"), 4).as("avg_k"))
      .orderBy("event_type")

  // ------------------------------------------------------------- oracle SQL

  def oracleSql: Map[String, String] = Map(
    "q_mean_filter" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS n_rows,
        |  round(avg(l_quantity) + 1e-9, 4) AS mean_qty,
        |  round(avg(l_extendedprice) + 1e-9, 4) AS mean_price,
        |  round(avg(l_discount) + 1e-9, 6) AS mean_disc,
        |  round(avg(l_tax) + 1e-9, 6) AS mean_tax
        |FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q_field_stats" ->
      """WITH longv AS (
        |  SELECT 'l_quantity' AS field, CAST(l_quantity AS DOUBLE) AS value FROM lineitem
        |  UNION ALL SELECT 'l_discount', CAST(l_discount AS DOUBLE) FROM lineitem
        |  UNION ALL SELECT 'l_tax', CAST(l_tax AS DOUBLE) FROM lineitem),
        |m AS (
        |  SELECT field, count(value) AS n, avg(value) AS mu, var_pop(value) AS m2,
        |    avg(value*value) AS e2, avg(value*value*value) AS e3,
        |    avg(value*value*value*value) AS e4,
        |    min(value) AS vmin, max(value) AS vmax, median(value) AS med,
        |    avg(abs(value)) AS amean, max(abs(value)) AS amax
        |  FROM longv GROUP BY 1)
        |SELECT field, n, round(mu + 1e-9, 4) AS mean, round(m2 + 1e-9, 4) AS var_pop,
        |  round(sqrt(m2) + 1e-9, 4) AS std_pop, round(vmin + 1e-9, 4) AS min, round(vmax + 1e-9, 4) AS max,
        |  round(med + 1e-9, 4) AS median, round(amean + 1e-9, 4) AS abs_mean, round(amax + 1e-9, 4) AS abs_max,
        |  round((e3 - 3*mu*e2 + 2*mu*mu*mu) / pow(m2, 1.5) + 1e-9, 4) AS skew,
        |  round((e4 - 4*mu*e3 + 6*mu*mu*e2 - 3*mu*mu*mu*mu) / (m2*m2) - 3 + 1e-9, 4) AS kurt
        |FROM m ORDER BY field""".stripMargin,

    "q_welford_state" ->
      """WITH longv AS (
        |  SELECT 'l_quantity' AS field, CAST(l_quantity AS DOUBLE) AS value FROM lineitem
        |  UNION ALL SELECT 'l_discount', CAST(l_discount AS DOUBLE) FROM lineitem
        |  UNION ALL SELECT 'l_tax', CAST(l_tax AS DOUBLE) FROM lineitem),
        |m AS (
        |  SELECT field, count(value) AS n, avg(value) AS mu, var_pop(value) AS m2,
        |    avg(value*value) AS e2, avg(value*value*value) AS e3,
        |    avg(value*value*value*value) AS e4,
        |    min(value) AS vmin, max(value) AS vmax, avg(abs(value)) AS amean
        |  FROM longv GROUP BY 1)
        |SELECT field, n, round(mu + 1e-9, 6) AS mean, round(m2 + 1e-9, 4) AS mom2,
        |  round(e3 - 3*mu*e2 + 2*mu*mu*mu + 1e-9, 4) AS mom3,
        |  round(e4 - 4*mu*e3 + 6*mu*mu*e2 - 3*mu*mu*mu*mu + 1e-9, 3) AS mom4,
        |  round(vmin + 1e-9, 4) AS min, round(vmax + 1e-9, 4) AS max, round(amean + 1e-9, 6) AS abs_mean
        |FROM m ORDER BY field""".stripMargin,

    "q_join_regional_revenue" ->
      """SELECT r_name, n_name, count(*) AS n_items,
        |  round(sum(l_extendedprice * (1.0 - l_discount)) + 1e-6, 2) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q_semi_customers_with_orders" ->
      """SELECT c_custkey, c_mktsegment, c_acctbal FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY c_custkey""".stripMargin,

    "q_anti_customers_without_orders" ->
      """SELECT c_custkey, c_mktsegment, c_acctbal FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
        |ORDER BY c_custkey""".stripMargin,

    "q_distinct_edges" ->
      """SELECT DISTINCT least(l_partkey, l_suppkey) AS edge_a,
        |  greatest(l_partkey, l_suppkey) AS edge_b
        |FROM lineitem
        |WHERE least(l_partkey, l_suppkey) <> greatest(l_partkey, l_suppkey)
        |ORDER BY 1, 2""".stripMargin,

    "q_keep_first_dedup" ->
      """SELECT l_partkey, l_suppkey, CAST(min(l_orderkey) AS BIGINT) AS min_l_orderkey,
        |  count(*) AS n_dups
        |FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q_permutation_ids" ->
      """SELECT * FROM (
        |  SELECT l_returnflag, l_orderkey, l_linenumber,
        |    CAST(row_number() OVER (PARTITION BY l_returnflag
        |      ORDER BY l_orderkey, l_linenumber) AS INTEGER) AS new_id
        |  FROM lineitem) t
        |WHERE new_id <= 100 ORDER BY l_returnflag, new_id""".stripMargin,

    "q_window_lag_delta" ->
      """SELECT user_id, event_id,
        |  round(value - lag(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) + 1e-6, 2)
        |    AS delta
        |FROM events ORDER BY user_id, event_id""".stripMargin,

    "q_pivot_event_matrix" ->
      """SELECT user_id,
        |  round(sum(CASE WHEN event_type = 'click' THEN value END) + 1e-6, 2) AS click,
        |  round(sum(CASE WHEN event_type = 'error' THEN value END) + 1e-6, 2) AS error,
        |  round(sum(CASE WHEN event_type = 'purchase' THEN value END) + 1e-6, 2) AS purchase,
        |  round(sum(CASE WHEN event_type = 'signup' THEN value END) + 1e-6, 2) AS signup,
        |  round(sum(CASE WHEN event_type = 'view' THEN value END) + 1e-6, 2) AS view
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_grid_stats" ->
      """SELECT event_type, date_trunc('hour', ts) AS hour, count(value) AS n,
        |  round(avg(value) + 1e-9, 4) AS mean, round(var_pop(value) + 1e-9, 4) AS var_pop,
        |  min(value) AS min, max(value) AS max
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q_year_partition_counts" ->
      """SELECT event_type, CAST(year(ts) AS INTEGER) AS yr, count(*) AS n,
        |  round(CAST(sum(value) AS DOUBLE) + 1e-6, 2) AS sum_value
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q_nan_inf_census" ->
      """SELECT
        |  CAST(sum(CASE WHEN isnan(l_quantity) THEN 1 ELSE 0 END) AS BIGINT) AS n_nan_l_quantity,
        |  CAST(sum(CASE WHEN isinf(l_quantity) THEN 1 ELSE 0 END) AS BIGINT) AS n_inf_l_quantity,
        |  CAST(sum(CASE WHEN l_quantity IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null_l_quantity,
        |  CAST(sum(CASE WHEN isnan(l_extendedprice) THEN 1 ELSE 0 END) AS BIGINT) AS n_nan_l_extendedprice,
        |  CAST(sum(CASE WHEN isinf(l_extendedprice) THEN 1 ELSE 0 END) AS BIGINT) AS n_inf_l_extendedprice,
        |  CAST(sum(CASE WHEN l_extendedprice IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null_l_extendedprice,
        |  CAST(sum(CASE WHEN isnan(l_discount) THEN 1 ELSE 0 END) AS BIGINT) AS n_nan_l_discount,
        |  CAST(sum(CASE WHEN isinf(l_discount) THEN 1 ELSE 0 END) AS BIGINT) AS n_inf_l_discount,
        |  CAST(sum(CASE WHEN l_discount IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null_l_discount
        |FROM lineitem""".stripMargin,

    "q_von_mises" ->
      """WITH v AS (
        |  SELECT l_returnflag,
        |    sqrt(
        |      (pow(l_quantity - l_extendedprice/1000.0, 2)
        |       + pow(l_extendedprice/1000.0 - l_discount*100.0, 2)
        |       + pow(l_discount*100.0 - l_quantity, 2)) / 2.0
        |      + 3.0 * (pow(l_tax*10.0, 2) + pow(CAST(l_linenumber AS DOUBLE), 2)
        |               + pow(l_quantity/2.0, 2))) AS vm
        |  FROM lineitem)
        |SELECT l_returnflag, count(*) AS n, round(avg(vm) + 1e-9, 4) AS vm_mean,
        |  round(min(vm) + 1e-9, 4) AS vm_min, round(max(vm) + 1e-9, 4) AS vm_max
        |FROM v GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_precision_cast" ->
      """SELECT l_orderkey, l_linenumber, CAST(l_extendedprice AS REAL) AS price_f32,
        |  CAST(l_discount AS REAL) AS disc_f32
        |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "q_field_select_pushdown" ->
      """SELECT l_orderkey, l_shipdate FROM lineitem
        |WHERE l_shipdate < TIMESTAMP '1996-07-01' AND l_discount > 0.05
        |ORDER BY l_orderkey, l_shipdate""".stripMargin,

    "q_global_inject" ->
      """SELECT c_custkey, c_acctbal, CAST(1.225 AS DOUBLE) AS rho_inf, g.s_avg
        |FROM customer, (SELECT round(avg(s_acctbal) + 1e-9, 4) AS s_avg FROM supplier) g
        |ORDER BY c_custkey""".stripMargin,

    "q_array_explode" ->
      """SELECT vec_id, CAST(unnest(generate_series(1, len(embedding))) AS INTEGER) AS pos,
        |  CAST(unnest(embedding) AS DOUBLE) AS val
        |FROM embeddings ORDER BY vec_id, pos""".stripMargin,

    "q_point_to_cell_mean" ->
      """SELECT vec_id, label, count(*) AS n_vertices,
        |  round(avg(CAST(v AS DOUBLE)) + 1e-9, 6) AS cell_mean
        |FROM (SELECT vec_id, label, unnest(embedding) AS v FROM embeddings)
        |GROUP BY 1, 2 ORDER BY vec_id""".stripMargin,

    "q_json_extract" ->
      """SELECT event_type, count(*) AS n,
        |  CAST(sum(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS BIGINT) AS sum_k,
        |  round(avg(CAST(json_extract_string(props, '$.k') AS INTEGER)) + 1e-9, 4) AS avg_k
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
  )
}
