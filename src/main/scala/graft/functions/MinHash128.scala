package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native MinHash signature over a set of shingle hashes.
  *
  * sig[k] = min over elements h of xxhash64(h, seed_k) with
  * seed_k = xxhash64(k, 42) — the same value the relational
  * formulation `min(xxhash64(lit(k), col))` produces (Spark's
  * multi-arg xxhash64 folds arguments left-to-right from seed 42),
  * but all 128 signature rows in ONE pass per row: no explode, no
  * 128-buffer aggregation, no shuffle. The k-seeds are precomputed
  * once and shipped as a reference object into the generated code.
  */
case class MinHash128(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash128 requires array<bigint>, got ${other.catalogString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash128"

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val mins = Array.fill(MinHash128.K)(Long.MaxValue)
    var i = 0
    while (i < arr.numElements()) {
      if (!arr.isNullAt(i)) {
        val h = arr.getLong(i)
        var k = 0
        while (k < MinHash128.K) {
          val v = XXH64.hashLong(h, MinHash128.seeds(k))
          if (v < mins(k)) mins(k) = v
          k += 1
        }
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val seeds = ctx.addReferenceObj("minhashSeeds", MinHash128.seeds,
        "long[]")
      val mins = ctx.freshName("mins")
      val i = ctx.freshName("i")
      val k = ctx.freshName("k")
      val h = ctx.freshName("h")
      val v = ctx.freshName("v")
      val xxh = classOf[XXH64].getName
      s"""
         |long[] $mins = new long[${MinHash128.K}];
         |java.util.Arrays.fill($mins, Long.MAX_VALUE);
         |for (int $i = 0; $i < $arr.numElements(); $i++) {
         |  if (!$arr.isNullAt($i)) {
         |    long $h = $arr.getLong($i);
         |    for (int $k = 0; $k < ${MinHash128.K}; $k++) {
         |      long $v = $xxh.hashLong($h, $seeds[$k]);
         |      if ($v < $mins[$k]) $mins[$k] = $v;
         |    }
         |  }
         |}
         |${ev.value} =
         |  new org.apache.spark.sql.catalyst.util.GenericArrayData($mins);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): MinHash128 =
    copy(child = newChild)
}

object MinHash128 {
  val K = 128
  /** seed_k = xxhash64(k:int) at base seed 42, matching how Spark's
    * xxhash64(k, h) folds the leading int argument. */
  val seeds: Array[Long] = Array.tabulate(K)(k => XXH64.hashInt(k, 42L))
}
