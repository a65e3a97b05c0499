package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Locale-pinned lowering for the canonical text form.
  *
  * Spark's `lower()` has a locale-free fast path for ASCII bytes but
  * falls back to `String.toLowerCase()` — the JVM DEFAULT locale — for
  * anything else. On a Turkish-locale JVM that maps I→ı and İ→i, so
  * every downstream hash (shingles, MinHash, SimHash, fingerprints)
  * silently diverges from the same data processed on an English-locale
  * cluster — and from the Scala-side kernels, which already pin
  * `Locale.ROOT`. A dedup pipeline must produce the same signatures on
  * every executor JVM regardless of OS locale, so the canonical form
  * lowers through ROOT everywhere.
  */
object TextCase {
  /** ROOT-locale lowercase of a UTF8String; allocation-light ASCII path. */
  def rootLower(s: UTF8String): UTF8String = {
    val b = s.getBytes
    val n = b.length
    var ascii = true
    var i = 0
    while (ascii && i < n) { if (b(i) < 0) ascii = false; i += 1 }
    if (ascii) {
      val out = new Array[Byte](n)
      i = 0
      while (i < n) {
        val c = b(i)
        out(i) = if (c >= 'A' && c <= 'Z') (c + 32).toByte else c
        i += 1
      }
      UTF8String.fromBytes(out)
    } else {
      UTF8String.fromString(s.toString.toLowerCase(java.util.Locale.ROOT))
    }
  }
}

/** `lower()` with the locale pinned to ROOT (see [[TextCase]]). */
case class RootLower(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"root_lower needs a string input, got ${child.dataType}")
  override def dataType: DataType = StringType
  override def prettyName: String = "root_lower"

  override def nullSafeEval(v: Any): Any =
    TextCase.rootLower(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextCase.rootLower($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object RootLower {
  def apply(c: Column): Column = Bridge.column(RootLower(Bridge.expression(c)))
}
