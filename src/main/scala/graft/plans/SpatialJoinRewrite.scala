package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DoubleType, IntegerType, LongType}

/** Catalyst optimizer rule: rewrite the naive squared-distance theta
  * join — `a JOIN b ON (ax−bx)·(ax−bx) + (ay−by)·(ay−by) <= r²`, which
  * Spark can only plan as a BroadcastNestedLoop/Cartesian product — into
  * the grid-cell equi-join (`RelationalOps.radiusJoin`'s shape): the
  * left side fans out to its 3×3 cell neighborhood with a `Generate`,
  * both sides gain `floor(coord / r)` cell keys, the join becomes a
  * hash/sort-merge EQUI-join on the cells, and the original distance
  * predicate survives as a post-join filter (so the rewrite is
  * correctness-preserving by construction: cells only restrict
  * candidates, and every pair within r shares a 3×3 neighborhood).
  *
  * This is the whole-operator Catalyst integration tier (logical
  * `Rule` injected via [[SparkSessionExtensions]]): a user writes the
  * declarative O(n²) condition and the optimizer plans the scale
  * algorithm — the same contract Spark itself applies when it turns
  * `ORDER BY ... LIMIT k` into TakeOrdered. Conditions on the match:
  * integer-typed coordinate attributes, one side each, and a
  * non-negative integral r² literal (cell width = ⌈√r²⌉).
  */
object SpatialJoinRewrite extends Rule[LogicalPlan] {

  /** (ax − bx) * (ax − bx) with both factors the SAME subtraction. */
  private object Sq {
    def unapply(e: Expression): Option[(Attribute, Attribute)] = e match {
      case Multiply(s1 @ Subtract(a1: Attribute, b1: Attribute, _),
          Subtract(a2: Attribute, b2: Attribute, _), _)
        if a1.semanticEquals(a2) && b1.semanticEquals(b2) =>
        Some((a1, b1))
      case _ => None
    }
  }

  private def isIntegral(a: Attribute): Boolean =
    a.dataType == LongType || a.dataType == IntegerType

  private object IntegralLit {
    def unapply(e: Expression): Option[Long] = e match {
      case Literal(v: Long, LongType) => Some(v)
      case Literal(v: Int, IntegerType) => Some(v.toLong)
      case _ => None
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case j @ Join(left, right,
        Inner,
        Some(LessThanOrEqual(Add(Sq(ax1, bx1), Sq(ay1, by1), _),
          IntegralLit(r2v))),
        hint)
      if r2v >= 0 &&
        Seq(ax1, ay1, bx1, by1).forall(isIntegral) && {
          // orient: the x/y attributes of each squared term must come
          // from opposite sides (either order)
          val lo = left.outputSet
          val ro = right.outputSet
          (lo.contains(ax1) && ro.contains(bx1) &&
            lo.contains(ay1) && ro.contains(by1)) ||
          (ro.contains(ax1) && lo.contains(bx1) &&
            ro.contains(ay1) && lo.contains(by1))
        } =>
      val (lx, ly, rx, ry) =
        if (left.outputSet.contains(ax1)) (ax1, ay1, bx1, by1)
        else (bx1, by1, ax1, ay1)
      val r = math.ceil(math.sqrt(r2v.toDouble)).toLong.max(1L)

      def cellOf(c: Attribute): Expression =
        Cast(Floor(Divide(Cast(c, DoubleType), Literal(r.toDouble))), LongType)

      // left: cell base + 3×3 neighborhood fan-out via Generate(Explode)
      val dxAttr = AttributeReference("_g_dx", IntegerType, nullable = false)()
      val dyAttr = AttributeReference("_g_dy", IntegerType, nullable = false)()
      val offsets = for (dx <- -1 to 1; dy <- -1 to 1)
        yield CreateStruct(Seq(Literal(dx), Literal(dy)))
      // Inline (not Explode): array<struct<dx,dy>> flattens to the two
      // generator columns directly
      val gen = Generate(Inline(CreateArray(offsets)),
        unrequiredChildIndex = Nil, outer = false, qualifier = None,
        generatorOutput = Seq(dxAttr, dyAttr), child = left)
      val lcx = Alias(Add(cellOf(lx), Cast(dxAttr, LongType)), "_g_cx")()
      val lcy = Alias(Add(cellOf(ly), Cast(dyAttr, LongType)), "_g_cy")()
      val leftProj = Project(left.output ++ Seq(lcx, lcy), gen)

      val rcx = Alias(cellOf(rx), "_g_rcx")()
      val rcy = Alias(cellOf(ry), "_g_rcy")()
      val rightProj = Project(right.output ++ Seq(rcx, rcy), right)

      val cellCond = And(
        EqualTo(lcx.toAttribute, rcx.toAttribute),
        EqualTo(lcy.toAttribute, rcy.toAttribute))
      val joined = Join(leftProj, rightProj, Inner, Some(cellCond), hint)
      val filtered = Filter(j.condition.get, joined)
      Project(j.output, filtered)
  }

  /** Extension entry point: `.withExtensions(SpatialJoinRewrite.install)`
    * or `spark.sql.extensions=graft.plans.GraftExtensions`.
    */
  def install(e: SparkSessionExtensions): Unit =
    e.injectOptimizerRule(_ => SpatialJoinRewrite)
}

/** `spark.sql.extensions` entry point installing every graft rule. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit =
    SpatialJoinRewrite.install(e)
}
