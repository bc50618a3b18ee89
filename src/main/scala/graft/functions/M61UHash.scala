package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** The Carter–Wegman universal hash over the Mersenne prime,
  * ((a · (u & p)) + b) mod p, as a codegen'd long expression —
  * the long-arithmetic twin of the SQL replay
  * `(CAST(a AS HUGEINT) * (u & 2305843009213693951) + b)
  *   % 2305843009213693951`. The 61-bit mask appears on BOTH sides
  * (ADVICE r10): u & p ≠ u mod p for u ≥ 2^61 or u < 0, so an oracle
  * replaying the bare `% p` would silently diverge on out-of-range
  * inputs — bitwise AND on two's-complement bigints is identical in
  * the JVM and DuckDB, closing that seam for ANY long u. Exists so
  * hot per-row hashing (ev_count_min's d positions per event) runs
  * as ~10 long ops inside whole-stage codegen instead of a
  * DECIMAL(38,0) expression chain (measured 6× slower end-to-end).
  * a and b are required literals (they're the seeds the oracle
  * embeds, never data). */
case class M61UHash(first: Expression, second: Expression,
    third: Expression) extends TernaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (Seq(first, second, third).exists(_.dataType != LongType))
      TypeCheckResult.TypeCheckFailure(
        "m61_uhash requires (bigint u, bigint a, bigint b)")
    else if (!second.foldable || !third.foldable)
      TypeCheckResult.TypeCheckFailure(
        "m61_uhash seeds a, b must be literals")
    else {
      // the function is publicly registered: validate the seed RANGE
      // at analysis time (ADVICE r10) — a outside [1, p) breaks
      // mulMod's unsigned-multiplyHigh precondition and b near
      // Long.MaxValue overflows mulMod(a,u) + b, both silently
      // returning garbage longs if let through
      val a = Option(second.eval()).map(_.asInstanceOf[Long])
      val b = Option(third.eval()).map(_.asInstanceOf[Long])
      if (a.exists(v => v < 1L || v >= Mersenne61.P))
        TypeCheckResult.TypeCheckFailure(
          s"m61_uhash seed a must be in [1, 2^61-1), got ${a.get}")
      else if (b.exists(v => v < 0L || v >= Mersenne61.P))
        TypeCheckResult.TypeCheckFailure(
          s"m61_uhash seed b must be in [0, 2^61-1), got ${b.get}")
      else TypeCheckResult.TypeCheckSuccess
    }

  override def dataType: DataType = LongType
  override def prettyName: String = "m61_uhash"

  override protected def nullSafeEval(u: Any, a: Any, b: Any): Any =
    M61UHash.hash(u.asInstanceOf[Long], a.asInstanceOf[Long],
      b.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (u, a, b) => {
      val helper = M61UHash.getClass.getName.stripSuffix("$") + "$.MODULE$"
      s"${ev.value} = $helper.hash($u, $a, $b);"
    })

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression): M61UHash =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object M61UHash {
  import Mersenne61.{mulMod, P}

  /** Shared by eval and codegen. */
  def hash(u: Long, a: Long, b: Long): Long = {
    var h = mulMod(a, u & P) + b // both < p ⇒ sum < 2^62
    if (h >= P) h -= P
    h
  }
}
