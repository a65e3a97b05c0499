package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.sql.types.{DoubleType, IntegerType, LongType}

/** Catalyst optimizer rule: rewrite naive spatial theta joins — which
  * Spark can only plan as BroadcastNestedLoop/Cartesian products — into
  * grid-cell equi-joins (`RelationalOps.radiusJoin`'s shape). Four
  * predicate families are recognized, all over LONG coordinate
  * attributes with one side's coordinates on each join input:
  *
  *  1. squared L2:  `(ax−bx)² + (ay−by)² <= r²`       → cells of ⌈√r²⌉
  *  2. Manhattan:   `|ax−bx| + |ay−by| <= r`          → cells of r
  *  3. Chebyshev:   `greatest(|ax−bx|, |ay−by|) <= r` → cells of r
  *  4. bbox:        `xmin <= px AND px <= xmax AND
  *                   ymin <= py AND py <= ymax`       → box fan-out
  *  5. 1-D band:    `|a−b| <= r` or `a >= b−r AND a <= b+r` (the whole
  *                   condition) → width-r cells, 3-offset fan-out (the
  *                   value-tolerance join, in both spellings)
  *
  * For 1–3 the left side fans out to its 3×3 cell neighborhood with a
  * `Generate` (an Lp ball of radius r is inside the L∞ ball of radius
  * r, so every qualifying pair shares a 3×3 neighborhood of width-r
  * cells); for 4 the box side explodes to every cell its bbox overlaps
  * (`sequence(floor(min/cs), floor(max/cs))` per axis — the same
  * candidate shape as `RelationalOps.pointInPolygonJoin`) while the
  * point keys to its single cell. In every case the join becomes a
  * hash/sort-merge EQUI-join on the cells and the original predicate
  * survives as a post-join filter, so the rewrite is
  * correctness-preserving by construction: cells only restrict
  * candidates, never admit extra pairs.
  *
  * The match is restricted to LongType coordinates: with IntegerType
  * attributes the naive predicate's int arithmetic wraps at
  * |Δ| ≥ 46341 under non-ANSI evaluation, so a far pair can evaluate
  * TRUE in the un-rewritten plan while the cell join (correctly)
  * excludes it — the rule must not change which rows a query returns
  * depending on whether it fired. LongType arithmetic assumes
  * non-overflowing deltas (|Δ| < 3.03e9 for the squared form — any
  * realistic integer lattice), which we document rather than guard:
  * the same assumption the naive predicate itself needs to be
  * meaningful.
  *
  * This is the whole-operator Catalyst integration tier (logical
  * `Rule` injected via [[SparkSessionExtensions]]): a user writes the
  * declarative O(n²) condition and the optimizer plans the scale
  * algorithm — the same contract Spark itself applies when it turns
  * `ORDER BY ... LIMIT k` into TakeOrdered. The bbox cell width comes
  * from `spark.graft.spatial.bboxCellSize` (default 4096) because no
  * width is derivable from the predicate alone.
  */
object SpatialJoinRewrite extends Rule[LogicalPlan] {

  /** (ax − bx) * (ax − bx) with both factors the SAME subtraction. */
  private object Sq {
    def unapply(e: Expression): Option[(Attribute, Attribute)] = e match {
      case Multiply(Subtract(a1: Attribute, b1: Attribute, _),
          Subtract(a2: Attribute, b2: Attribute, _), _)
        if a1.semanticEquals(a2) && b1.semanticEquals(b2) =>
        Some((a1, b1))
      case _ => None
    }
  }

  /** abs(ax − bx) over attributes. */
  private object AbsDiff {
    def unapply(e: Expression): Option[(Attribute, Attribute)] = e match {
      case Abs(Subtract(a: Attribute, b: Attribute, _), _) => Some((a, b))
      case _ => None
    }
  }

  private def isLong(a: Attribute): Boolean = a.dataType == LongType

  private object IntegralLit {
    def unapply(e: Expression): Option[Long] = e match {
      case Literal(v: Long, LongType) => Some(v)
      case Literal(v: Int, IntegerType) => Some(v.toLong)
      case _ => None
    }
  }

  /** Coordinates pair off with one side each (either orientation). */
  private def oriented(left: LogicalPlan, right: LogicalPlan,
                       ax: Attribute, bx: Attribute,
                       ay: Attribute, by: Attribute)
  : Option[(Attribute, Attribute, Attribute, Attribute)] = {
    val lo = left.outputSet
    val ro = right.outputSet
    if (lo.contains(ax) && ro.contains(bx) &&
      lo.contains(ay) && ro.contains(by)) Some((ax, ay, bx, by))
    else if (ro.contains(ax) && lo.contains(bx) &&
      ro.contains(ay) && lo.contains(by)) Some((bx, by, ax, ay))
    else None
  }

  /** Exact Long floor division c / width (width > 0): (c − pmod(c, w)) is
    * divisible, so truncating div IS floor div. A Double-cast formulation
    * would misassign cells for |c| > 2^53 and silently drop qualifying
    * pairs; exact integer arithmetic keeps the rewrite lossless over the
    * whole Long range (minus the ±2^63-edge where the naive predicate's
    * own arithmetic is already meaningless).
    */
  private def cellOf(c: Expression, width: Long): Expression = {
    val w = Literal(width)
    new IntegralDivide(Subtract(c, Pmod(c, w)), w)
  }

  /** Shared tail for the three distance forms: 3×3 fan-out on the left,
    * single cell on the right, equi-join, original predicate as filter.
    */
  private def cellJoin(j: Join, lx: Attribute, ly: Attribute,
                       rx: Attribute, ry: Attribute, width: Long)
  : LogicalPlan = {
    val dxAttr = AttributeReference("_g_dx", IntegerType, nullable = false)()
    val dyAttr = AttributeReference("_g_dy", IntegerType, nullable = false)()
    val offsets = for (dx <- -1 to 1; dy <- -1 to 1)
      yield CreateStruct(Seq(Literal(dx), Literal(dy)))
    // Inline (not Explode): array<struct<dx,dy>> flattens to the two
    // generator columns directly
    val gen = Generate(Inline(CreateArray(offsets)),
      unrequiredChildIndex = Nil, outer = false, qualifier = None,
      generatorOutput = Seq(dxAttr, dyAttr), child = j.left)
    val lcx = Alias(Add(cellOf(lx, width), Cast(dxAttr, LongType)), "_g_cx")()
    val lcy = Alias(Add(cellOf(ly, width), Cast(dyAttr, LongType)), "_g_cy")()
    val leftProj = Project(j.left.output ++ Seq(lcx, lcy), gen)

    val rcx = Alias(cellOf(rx, width), "_g_rcx")()
    val rcy = Alias(cellOf(ry, width), "_g_rcy")()
    val rightProj = Project(j.right.output ++ Seq(rcx, rcy), j.right)

    val cellCond = And(
      EqualTo(lcx.toAttribute, rcx.toAttribute),
      EqualTo(lcy.toAttribute, rcy.toAttribute))
    val joined = Join(leftProj, rightProj, Inner, Some(cellCond), j.hint)
    val filtered = Filter(j.condition.get, joined)
    Project(j.output, filtered)
  }

  /** 1-D band join — `abs(a − b) <= r` alone (the tolerance/band theta
    * join behind value-proximity matching): the 1-D specialization of
    * [[cellJoin]] with a 3-offset fan-out on width-r cells. Any
    * qualifying pair's cells differ by at most 1, so −1/0/+1 covers.
    */
  private def bandJoin(j: Join, lx: Attribute, rx: Attribute,
                       width: Long): LogicalPlan = {
    val dxAttr = AttributeReference("_g_dx", IntegerType, nullable = false)()
    val gen = Generate(
      Explode(CreateArray(Seq(Literal(-1), Literal(0), Literal(1)))),
      unrequiredChildIndex = Nil, outer = false, qualifier = None,
      generatorOutput = Seq(dxAttr), child = j.left)
    val lcx = Alias(Add(cellOf(lx, width), Cast(dxAttr, LongType)), "_g_cx")()
    val leftProj = Project(j.left.output :+ lcx, gen)
    val rcx = Alias(cellOf(rx, width), "_g_rcx")()
    val rightProj = Project(j.right.output :+ rcx, j.right)
    val joined = Join(leftProj, rightProj, Inner,
      Some(EqualTo(lcx.toAttribute, rcx.toAttribute)), j.hint)
    Project(j.output, Filter(j.condition.get, joined))
  }

  /** Any `e1 <= e2`, normalized from either comparison direction. */
  private object BoundLeq {
    def unapply(e: Expression): Option[(Expression, Expression)] = e match {
      case LessThanOrEqual(a, b) => Some((a, b))
      case GreaterThanOrEqual(a, b) => Some((b, a))
      case _ => None
    }
  }

  /** The BETWEEN formulation of the 1-D band — `a >= b − r AND
    * a <= b + r` with the SAME attributes and the SAME literal r on
    * both bounds (what tolerance joins are actually written as). Long
    * attributes only, one per join side; equivalent to `|a−b| <= r`.
    */
  private def matchBetweenBand(left: LogicalPlan, right: LogicalPlan,
                               cond: Expression)
  : Option[(Attribute, Attribute, Long)] = cond match {
    case And(BoundLeq(l1, h1), BoundLeq(l2, h2)) =>
      def lowerB(lo: Expression, hi: Expression) = (lo, hi) match {
        case (Subtract(b: Attribute, IntegralLit(r), _), a: Attribute) =>
          Some((a, b, r))
        case _ => None
      }
      def upperB(lo: Expression, hi: Expression) = (lo, hi) match {
        case (a: Attribute, Add(b: Attribute, IntegralLit(r), _)) =>
          Some((a, b, r))
        case _ => None
      }
      Seq((l1, h1, l2, h2), (l2, h2, l1, h1)).flatMap {
        case (la, ha, lb, hb) =>
          for {
            (a1, b1, r1) <- lowerB(la, ha)
            (a2, b2, r2) <- upperB(lb, hb)
            if a1.semanticEquals(a2) && b1.semanticEquals(b2) &&
              r1 == r2 && r1 >= 0 && isLong(a1) && isLong(b1) &&
              ((left.outputSet.contains(a1) && right.outputSet.contains(b1)) ||
                (right.outputSet.contains(a1) && left.outputSet.contains(b1)))
          } yield (a1, b1, r1)
      }.headOption
    case _ => None
  }

  /** One conjunct of a bbox predicate, normalized to lo <= hi. */
  private object LeqAttrs {
    def unapply(e: Expression): Option[(Attribute, Attribute)] = e match {
      case LessThanOrEqual(a: Attribute, b: Attribute) => Some((a, b))
      case GreaterThanOrEqual(a: Attribute, b: Attribute) => Some((b, a))
      case _ => None
    }
  }

  /** Match the 4-conjunct bbox containment: point attrs (px, py) from
    * one side, bound attrs (xmin, xmax, ymin, ymax) from the other,
    * each point attr bounded below and above. Returns
    * (pointSideIsLeft, px, py, xmin, xmax, ymin, ymax).
    */
  private def matchBbox(left: LogicalPlan, right: LogicalPlan,
                        cond: Expression)
  : Option[(Boolean, Attribute, Attribute, Attribute, Attribute,
      Attribute, Attribute)] = {
    val conjuncts = {
      def split(e: Expression): Seq[Expression] = e match {
        case And(a, b) => split(a) ++ split(b)
        case other => Seq(other)
      }
      split(cond)
    }
    if (conjuncts.length != 4) return None
    val leqs = conjuncts.flatMap(LeqAttrs.unapply)
    if (leqs.length != 4 || !leqs.forall { case (a, b) =>
      isLong(a) && isLong(b) }) return None
    for (pointIsLeft <- Seq(true, false)) {
      val pSide = if (pointIsLeft) left.outputSet else right.outputSet
      val bSide = if (pointIsLeft) right.outputSet else left.outputSet
      // lower bounds: bound <= point; upper bounds: point <= bound
      val lowers = leqs.collect {
        case (b, p) if bSide.contains(b) && pSide.contains(p) => (p, b)
      }
      val uppers = leqs.collect {
        case (p, b) if pSide.contains(p) && bSide.contains(b) => (p, b)
      }
      if (lowers.length == 2 && uppers.length == 2) {
        val pts = lowers.map(_._1)
        if (pts.distinct.length == 2 &&
          uppers.map(_._1).toSet == pts.toSet) {
          val px = pts.head
          val py = pts(1)
          val xmin = lowers.find(_._1.semanticEquals(px)).get._2
          val ymin = lowers.find(_._1.semanticEquals(py)).get._2
          val xmax = uppers.find(_._1.semanticEquals(px)).get._2
          val ymax = uppers.find(_._1.semanticEquals(py)).get._2
          return Some((pointIsLeft, px, py, xmin, xmax, ymin, ymax))
        }
      }
    }
    None
  }

  private def bboxCellSize: Long =
    SQLConf.get.getConfString("spark.graft.spatial.bboxCellSize", "4096")
      .toLong.max(1L)

  private def maxBoxCells: Long =
    SQLConf.get.getConfString("spark.graft.spatial.maxBoxCells",
      (1L << 22).toString).toLong.max(1L)

  /** Bbox rewrite: box side explodes its cell cover per axis, point
    * side keys by its one cell, equi-join on (cx, cy), original
    * containment predicate refilters.
    */
  private def bboxJoin(j: Join, pointIsLeft: Boolean,
                       px: Attribute, py: Attribute,
                       xmin: Attribute, xmax: Attribute,
                       ymin: Attribute, ymax: Attribute): LogicalPlan = {
    val cs = bboxCellSize
    val (pPlan, bPlan) = if (pointIsLeft) (j.left, j.right)
      else (j.right, j.left)

    val pcx = Alias(cellOf(px, cs), "_g_pcx")()
    val pcy = Alias(cellOf(py, cs), "_g_pcy")()
    val pProj = Project(pPlan.output ++ Seq(pcx, pcy), pPlan)

    val bcx = AttributeReference("_g_bcx", LongType, nullable = true)()
    val bcy = AttributeReference("_g_bcy", LongType, nullable = true)()
    // A box's cell cover is data-dependent and the fan-out is its
    // PRODUCT: one degenerate row spanning the coordinate range would
    // turn a (slow but finite) nested-loop plan into a billions-of-rows
    // generate. Guard the cover at runtime — a box beyond the cap fails
    // LOUDLY with the conf knobs in the message instead of silently
    // exploding the job. (RaiseError types as NullType; the Cast to Long
    // never materializes because evaluation throws first.)
    val cap = maxBoxCells
    // guard each axis extent against the cap BEFORE multiplying: a
    // degenerate box spanning ~2^32+ cells per axis would wrap the Long
    // product and sneak past a product-only check, surfacing as
    // Sequence's opaque huge-array error instead of this message
    val dxCells = Add(Subtract(cellOf(xmax, cs), cellOf(xmin, cs)), Literal(1L))
    val dyCells = Add(Subtract(cellOf(ymax, cs), cellOf(ymin, cs)), Literal(1L))
    val overCap = Or(
      Or(GreaterThan(dxCells, Literal(cap)), GreaterThan(dyCells, Literal(cap))),
      GreaterThan(Multiply(dxCells, dyCells), Literal(cap)))
    def guarded(hi: Expression): Expression =
      If(overCap,
        Cast(new RaiseError(Literal(
          s"SpatialJoinRewrite: a bbox covers more than $cap grid cells; " +
            "raise spark.graft.spatial.bboxCellSize (cell width) or " +
            "spark.graft.spatial.maxBoxCells, or disable the rule")),
          LongType),
        hi)
    // Sequence is TimeZoneAwareExpression: without an explicit zone it
    // stays unresolved, and a post-analysis rule must emit resolved plans
    val tz = Some(SQLConf.get.sessionLocalTimeZone)
    val genX = Generate(
      Explode(Sequence(cellOf(xmin, cs), guarded(cellOf(xmax, cs)), None, tz)),
      unrequiredChildIndex = Nil, outer = false, qualifier = None,
      generatorOutput = Seq(bcx), child = bPlan)
    val genY = Generate(
      Explode(Sequence(cellOf(ymin, cs), cellOf(ymax, cs), None, tz)),
      unrequiredChildIndex = Nil, outer = false, qualifier = None,
      generatorOutput = Seq(bcy), child = genX)

    val cellCond = And(EqualTo(pcx.toAttribute, bcx),
      EqualTo(pcy.toAttribute, bcy))
    val joined =
      if (pointIsLeft) Join(pProj, genY, Inner, Some(cellCond), j.hint)
      else Join(genY, pProj, Inner, Some(cellCond), j.hint)
    Project(j.output, Filter(j.condition.get, joined))
  }

  /** The three distance families, matched ONCE (no guard + body
    * re-evaluation): returns the rewritten plan or None.
    */
  private def rewriteDistance(j: Join, left: LogicalPlan, right: LogicalPlan,
                              cond: Expression): Option[LogicalPlan] = {
    def tryCells(ax: Attribute, bx: Attribute, ay: Attribute, by: Attribute,
                 width: Long): Option[LogicalPlan] =
      if (Seq(ax, ay, bx, by).forall(isLong))
        oriented(left, right, ax, bx, ay, by).map { case (lx, ly, rx, ry) =>
          cellJoin(j, lx, ly, rx, ry, width)
        }
      else None
    cond match {
      case LessThanOrEqual(Add(Sq(ax, bx), Sq(ay, by), _), IntegralLit(r2v))
        if r2v >= 0 =>
        tryCells(ax, bx, ay, by,
          math.ceil(math.sqrt(r2v.toDouble)).toLong.max(1L))
      case LessThanOrEqual(Add(AbsDiff(ax, bx), AbsDiff(ay, by), _),
          IntegralLit(rv)) if rv >= 0 =>
        tryCells(ax, bx, ay, by, rv.max(1L))
      case LessThanOrEqual(Greatest(Seq(AbsDiff(ax, bx), AbsDiff(ay, by))),
          IntegralLit(rv)) if rv >= 0 =>
        tryCells(ax, bx, ay, by, rv.max(1L))
      // 1-D band: abs(a − b) <= r as the WHOLE condition (the value-
      // tolerance join); Long attributes only, same reasoning as 2-D
      case LessThanOrEqual(AbsDiff(ax, bx), IntegralLit(rv))
        if rv >= 0 && isLong(ax) && isLong(bx) =>
        val lo = left.outputSet
        val ro = right.outputSet
        val or2 =
          if (lo.contains(ax) && ro.contains(bx)) Some((ax, bx))
          else if (ro.contains(ax) && lo.contains(bx)) Some((bx, ax))
          else None
        or2.map { case (lx, rx) => bandJoin(j, lx, rx, rv.max(1L)) }
      case _ => None
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case j @ Join(left, right, Inner, Some(cond), _) =>
      rewriteDistance(j, left, right, cond)
        .orElse(matchBetweenBand(left, right, cond).map { case (a, b, r) =>
          val (lx, rx) = if (left.outputSet.contains(a)) (a, b) else (b, a)
          bandJoin(j, lx, rx, r.max(1L))
        })
        .orElse(matchBbox(left, right, cond).map {
          case (pIsL, px, py, xmin, xmax, ymin, ymax) =>
            bboxJoin(j, pIsL, px, py, xmin, xmax, ymin, ymax)
        })
        .getOrElse(j)
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
