package graft.functions

import java.util.Arrays

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Distinct hashed word-3-gram shingles of a token array, in one
  * generated pass: each 3-token window is hashed by chaining xxhash64
  * over the tokens' bytes (token boundaries feed the seed chain, so
  * no separator string is needed), then sorted + deduped in place.
  * Replaces the interpreted transform(sequence…concat…) +
  * array_distinct + transform(xxhash64) pipeline — no intermediate
  * shingle strings are ever built. Downstream set operations
  * (jaccard counts, MinHash) only need set identity, which hashing
  * preserves (collisions ~2^-64 per pair).
  */
case class ShingleHash3(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"shingle_hash3 requires array<string>, got ${other.catalogString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_hash3"

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    new GenericArrayData(ShingleHash3.compute(arr))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val helper = ShingleHash3.getClass.getName.stripSuffix("$") + "$.MODULE$"
      s"""
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  $helper.compute($arr));
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): ShingleHash3 =
    copy(child = newChild)
}

object ShingleHash3 {
  private def hashTok(s: UTF8String, seed: Long): Long =
    XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, seed)

  /** Sorted distinct window hashes; shared by eval and codegen.
    * NULL tokens are SKIPPED (PolyShingle3's contract): previously
    * the interpreted path NPE'd on a null slot while the Tungsten
    * path silently hashed zero bytes, fabricating a shingle. */
  def compute(arr: ArrayData): Array[Long] = {
    val total = arr.numElements()
    val toks = new Array[UTF8String](total)
    var n = 0
    var j = 0
    while (j < total) {
      if (!arr.isNullAt(j)) { toks(n) = arr.getUTF8String(j); n += 1 }
      j += 1
    }
    if (n < 3) return Array.emptyLongArray
    val out = new Array[Long](n - 2)
    var i = 0
    while (i < n - 2) {
      var h = 42L
      h = hashTok(toks(i), h)
      h = hashTok(toks(i + 1), h)
      h = hashTok(toks(i + 2), h)
      out(i) = h
      i += 1
    }
    Arrays.sort(out)
    // in-place unique over the sorted hashes
    var w = 1
    var r = 1
    while (r < out.length) {
      if (out(r) != out(r - 1)) { out(w) = out(r); w += 1 }
      r += 1
    }
    if (w == out.length) out else Arrays.copyOf(out, w)
  }
}
