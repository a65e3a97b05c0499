package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, ExprId, NamedExpression}
import org.apache.spark.sql.catalyst.plans.logical.{LeafNode, LogicalPlan}
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

/** Column-level lineage extracted from the ANALYZED Catalyst plan — the
  * governance question every curated release gets asked ("which source
  * columns fed this one?") answered from the plan itself rather than
  * documentation. Walks the logical tree bottom-up, mapping each
  * expression id to the set of (source table, source column) leaves that
  * feed it: projections/aggregations union the lineages of every
  * attribute their expressions reference; filters/joins/etc. pass
  * attribute lineage through unchanged; file-scan leaves name themselves
  * after their path's basename (the parquet table convention used by the
  * test data).
  *
  * Pure plan analysis — nothing is executed; cost is the size of the
  * plan, not the data.
  */
object Lineage {

  private def tableName(leaf: LeafNode): String = leaf match {
    case lr: LogicalRelation => lr.relation match {
      case fs: HadoopFsRelation =>
        fs.location.rootPaths.headOption.map { p =>
          val n = p.getName
          if (n.contains('.')) n.substring(0, n.indexOf('.')) else n
        }.getOrElse("unknown")
      case other => other.getClass.getSimpleName
    }
    case other => other.nodeName
  }

  /** exprId → the set of (table, column) leaves feeding it. */
  private def resolve(plan: LogicalPlan): Map[ExprId, Set[(String, String)]] = {
    plan match {
      case leaf: LeafNode =>
        val t = tableName(leaf)
        leaf.output.map(a => a.exprId -> Set(t -> a.name)).toMap
      case node =>
        val below = node.children.map(resolve).fold(Map.empty)(_ ++ _)
        def of(a: Attribute): Set[(String, String)] =
          below.getOrElse(a.exprId, Set.empty)
        // every named expression this node PRODUCES maps to the union of
        // its referenced attributes' lineages; pass-through attributes
        // keep their existing entry
        val produced = node.expressions.flatMap {
          case al: Alias =>
            Seq(al.exprId -> al.references.toSeq.flatMap(of).toSet)
          case ne: NamedExpression if !below.contains(ne.exprId) =>
            Seq(ne.exprId -> ne.references.toSeq.flatMap(of).toSet)
          case _ => Seq.empty
        }.toMap
        below ++ produced
    }
  }

  /** One row per (output column, source table, source column) edge, in
    * the frame's output order.
    */
  def columnLineage(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val plan = df.queryExecution.analyzed
    val resolved = resolve(plan)
    val rows = plan.output.flatMap { a =>
      val srcs = resolved.getOrElse(a.exprId, Set.empty)
      if (srcs.isEmpty) Seq((a.name, "literal", ""))
      else srcs.toSeq.sorted.map { case (t, c) => (a.name, t, c) }
    }
    rows.toDF("out_col", "src_table", "src_col")
  }
}
