package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** The Carter–Wegman universal hash over the Mersenne prime,
  * ((a · (u & p)) + b) mod p, as a codegen'd long expression —
  * the long-arithmetic twin of the SQL replay
  * `(CAST(a AS HUGEINT) * u + b) % 2305843009213693951`. Exists so
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
    else TypeCheckResult.TypeCheckSuccess

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
