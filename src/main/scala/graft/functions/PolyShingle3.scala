package graft.functions

import java.util.Arrays

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Arithmetic over the Mersenne prime p = 2^61 − 1 — the modulus the
  * SQL-replayable hash families (polynomial shingle hashes, the
  * MinHash universal family) share. Products of two residues fit in
  * 128 bits (2^122), which a SQL engine's HUGEINT takes directly
  * (`(a * u + b) % 2305843009213693951`); the JVM side gets the same
  * value from Math.multiplyHigh + the base-2^61 digit fold (2^61 ≡ 1
  * mod p, so a 128-bit product reduces by summing its three 61-bit
  * digits). Every operation is exact integer work — no platform or
  * engine can disagree.
  */
object Mersenne61 {
  val P: Long = (1L << 61) - 1
  val B: Long = 131L // the polynomial base every string fold uses

  /** (a · b) mod P for a, b ∈ [0, P). */
  def mulMod(a: Long, b: Long): Long = {
    val hi = Math.multiplyHigh(a, b) // a,b < 2^61 ⇒ signed == unsigned
    val lo = a * b // low 64 bits (wrapped)
    val d0 = lo & P
    val d1 = ((lo >>> 61) | (hi << 3)) & P
    val d2 = hi >>> 58
    var s = d0 + d1 + d2 // ≤ 3(2^61−1) < 2^63: no overflow
    s = (s & P) + (s >>> 61)
    if (s >= P) s - P else s
  }

  /** (a + b) mod P for a ∈ [0, P), b ∈ [0, 2^62 − P). */
  def addMod(a: Long, b: Long): Long = {
    val s = a + b
    if (s >= P) s - P else s
  }

  /** One Carter–Wegman (a, b) seed pair from a seeded LCG — a ∈
    * [1, p), b ∈ [0, p), drawn a-then-b. The draw SEQUENCE is part of
    * each family's identity (the oracles embed the resulting
    * literals): MinHash128 and SimHash64 both draw alternating pairs
    * and share this helper; EventOps.cmsSeeds draws all a's then all
    * b's and must NOT switch to it without accepting new committed
    * seed values. */
  def drawPair(rnd: java.util.Random): (Long, Long) = (
    ((rnd.nextLong() & Long.MaxValue) % (P - 1)) + 1,
    (rnd.nextLong() & Long.MaxValue) % P)

  /** Base-131 polynomial fold of a string's UNICODE CODEPOINTS mod P —
    * the canonical string→residue universe hash every SQL-replayable
    * family here builds on (shingle_poly3 uses a per-token
    * precomputed form of the same fold; simhash64 hashes raw tokens
    * with it). Matches DuckDB's `list_reduce` over `ord()` of each
    * character exactly. */
  def polyFold(s: String): Long = {
    var v = 0L
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      v = addMod(mulMod(v, B), cp.toLong)
      i += Character.charCount(cp)
    }
    v
  }
}

/** Distinct polynomial mod-(2^61−1) hashes of the word-3-gram
  * shingles of a token array — the SQL-REPLAYABLE twin of
  * shingle_hash3 (whose xxhash64 chain no SQL engine can recompute):
  * the hash of shingle "t1 t2 t3" is the base-131 polynomial fold of
  * its UNICODE CODEPOINTS, h = Σ c_i · 131^(n−1−i) mod p, exactly
  * what DuckDB's `list_reduce` over `ord()` of each character
  * computes on the reconstructed shingle string. Codepoints — not
  * UTF-8 bytes or UTF-16 units — are the unit both engines agree on
  * for ALL of Unicode (JVM: codePointAt stepping by charCount; SQL:
  * per-character ord()).
  *
  * One generated pass, linear in document length: each token folds
  * once into (value, 131^len) and each of the n−2 windows combines
  * three token folds plus two separator spaces in O(1) modmuls —
  * tokens are NOT re-scanned per window. Output is sorted + deduped
  * in place (a shingle SET, like shingle_hash3). Collisions between
  * distinct shingle strings are ~2^-61 per pair — set identity, and
  * therefore every downstream jaccard, is preserved.
  *
  * Consumed by dedup_minhash's universal-family MinHash (the hash
  * values feed (a·u+b) mod p, so u must already live in [0, p) —
  * this expression guarantees it).
  */
case class PolyShingle3(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"shingle_poly3 requires array<string>, got ${other.catalogString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_poly3"

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    new GenericArrayData(PolyShingle3.compute(arr))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val helper = PolyShingle3.getClass.getName.stripSuffix("$") + "$.MODULE$"
      s"""
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  $helper.compute($arr));
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): PolyShingle3 =
    copy(child = newChild)
}

object PolyShingle3 {
  import Mersenne61.{addMod, mulMod, B, P}

  private val SPACE = 32L // the shingle separator's codepoint

  /** (value, 131^len) of one token's codepoint fold. */
  private def tokenFold(s: String): (Long, Long) = {
    var v = 0L
    var pw = 1L
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      v = addMod(mulMod(v, B), cp.toLong)
      pw = mulMod(pw, B)
      i += Character.charCount(cp)
    }
    (v, pw)
  }

  /** Sorted distinct 3-gram polynomial hashes; shared by eval and
    * codegen. NULL tokens are SKIPPED (treated as absent) — the one
    * semantic both storage paths can honor identically: previously a
    * GenericArrayData-backed array NPE'd on a null slot while the
    * Tungsten path silently hashed it as "", fabricating a shingle
    * the DuckDB oracle (where the shingle string is NULL) never
    * emits. */
  def compute(arr: ArrayData): Array[Long] = {
    val total = arr.numElements()
    val vs = new Array[Long](total)
    val ps = new Array[Long](total)
    var n = 0
    var i = 0
    while (i < total) {
      if (!arr.isNullAt(i)) {
        val (v, p) = tokenFold(arr.getUTF8String(i).toString)
        vs(n) = v; ps(n) = p
        n += 1
      }
      i += 1
    }
    if (n < 3) return Array.emptyLongArray
    val out = new Array[Long](n - 2)
    i = 0
    while (i < n - 2) {
      // fold of "t_i ⌷ t_{i+1} ⌷ t_{i+2}" (⌷ = space) from the
      // precomputed per-token folds: append = acc·131^len + value
      var h = vs(i)
      h = addMod(mulMod(h, B), SPACE)
      h = addMod(mulMod(h, ps(i + 1)), vs(i + 1))
      h = addMod(mulMod(h, B), SPACE)
      h = addMod(mulMod(h, ps(i + 2)), vs(i + 2))
      out(i) = h
      i += 1
    }
    Arrays.sort(out)
    var w = 1
    var r = 1
    while (r < out.length) {
      if (out(r) != out(r - 1)) { out(w) = out(r); w += 1 }
      r += 1
    }
    if (w == out.length) out else Arrays.copyOf(out, w)
  }
}
