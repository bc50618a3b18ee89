package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class MinHash128Spec extends SparkSpec {

  private val P = BigInt(Mersenne61.P)

  test("polyFold indexes codepoints exactly like the DuckDB oracle " +
      "fold on combining marks, ZWJ sequences, and astral text") {
    // ADVICE r10: the shingle/simhash oracles assume DuckDB's
    // length()/s[i]/ord() iterate the SAME units as the JVM
    // codePointAt loop. Verified against DuckDB 1.0.0 (the driver's
    // oracle engine): its VARCHAR indexing is per UNICODE CODEPOINT —
    // combining marks and ZWJ joiners are separate codepoints on both
    // sides, NOT collapsed grapheme clusters. The expected literals
    // below are the exact outputs of polyFoldSql's list_reduce run in
    // DuckDB 1.0.0 over these strings; a DuckDB-side move to grapheme
    // indexing (or a JVM-side unit change) flips them.
    val duckdbFolds = Seq(
      "é" -> 233L, // precomposed é: one codepoint
      "é" -> 14000L, // e + combining acute: TWO codepoints
      // ZWJ family emoji: 5 codepoints (3 emoji + 2 ZWJ)
      "👨‍👩‍👧" -> 37747263079302L,
      "a😀b" -> 18499787L, // astral codepoint between ascii
      "x́̂̃" -> 283069370L, // stacked combining marks
      "héllo wörld" -> 342832435422856391L)
    duckdbFolds.foreach { case (s, expect) =>
      assert(Mersenne61.polyFold(s) == expect,
        s"polyFold('${s.map(c => f"\\u${c.toInt}%04x").mkString}') " +
          s"diverged from the DuckDB fold")
    }
    // and the pure-BigInt replay agrees for arbitrary text (the
    // in-JVM definition is self-consistent, independent of DuckDB)
    val rnd = new scala.util.Random(11)
    (1 to 50).foreach { _ =>
      val s = (1 to rnd.nextInt(12) + 1).map { _ =>
        val cp = rnd.nextInt(0x10000)
        // avoid isolated surrogates (invalid strings)
        if (cp >= 0xD800 && cp <= 0xDFFF) 'x'.toInt else cp
      }.flatMap(Character.toChars(_).toSeq).mkString
      var v = BigInt(0)
      var i = 0
      while (i < s.length) {
        val cp = s.codePointAt(i)
        v = (v * 131 + cp) % P
        i += Character.charCount(cp)
      }
      assert(Mersenne61.polyFold(s) == v.toLong)
    }
  }

  test("mersenne61 mulMod matches BigInt arithmetic across the range") {
    val rnd = new scala.util.Random(7)
    val edge = Seq(0L, 1L, 2L, Mersenne61.P - 1, Mersenne61.P - 2,
      1L << 60, (1L << 60) - 1)
    val samples = edge ++ Seq.fill(200)(
      (rnd.nextLong() & Long.MaxValue) % Mersenne61.P)
    for (a <- samples; b <- samples.take(20)) {
      val expect = (BigInt(a) * BigInt(b) % P).toLong
      assert(Mersenne61.mulMod(a, b) == expect, s"mulMod($a, $b)")
    }
  }

  test("native minhash128 matches the (h1 + k*h2) mod p reference, bit for bit") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (1L, Seq(11L, 22L, 33L, 44L)),
      (2L, Seq(11L, 22L, 33L)),
      (3L, Seq(Mersenne61.P - 1L))).toDF("doc_id", "s")

    val got = docs.select(col("doc_id"), expr("minhash128(s)").as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap

    def ref(us: Seq[Long]): Seq[Long] = (0 until MinHash128.K).map { k =>
      us.map { u =>
        val h1 = (BigInt(MinHash128.seedsA(0)) * u + MinHash128.seedsB(0)) % P
        val h2 = (BigInt(MinHash128.seedsA(1)) * u + MinHash128.seedsB(1)) % P
        ((h1 + k * h2) % P).toLong
      }.min
    }
    assert(got(1L) == ref(Seq(11L, 22L, 33L, 44L)))
    assert(got(2L) == ref(Seq(11L, 22L, 33L)))
    assert(got(3L) == ref(Seq(Mersenne61.P - 1L)))
    // the family's seeds are in range (the oracle embeds them as-is)
    assert(MinHash128.seedsA.forall(a => a >= 1 && a < Mersenne61.P))
    assert(MinHash128.seedsB.forall(b => b >= 0 && b < Mersenne61.P))
  }

  test("identical shingle sets produce identical signatures, supersets differ") {
    val s = spark
    import s.implicits._
    val sigs = Seq(
      (1L, Seq(5L, 6L, 7L)), (2L, Seq(7L, 6L, 5L)), (3L, Seq(5L, 6L, 7L, 8L)))
      .toDF("doc_id", "s")
      .select(col("doc_id"), expr("minhash128(s)").as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(sigs(1L) == sigs(2L), "order must not matter")
    assert(sigs(1L) != sigs(3L))
    // superset: every min can only go down
    assert(sigs(3L).zip(sigs(1L)).forall { case (sup, sub) => sup <= sub })
  }

  test("edge contracts: empty signature throws, null tokens are " +
      "skipped identically on both storage paths") {
    val s = spark
    import s.implicits._
    // minhash128 of an empty/all-null shingle set: LOUD failure (the
    // old Long.MaxValue sentinel band-collided every short doc while
    // the SQL replay emitted no row — silent divergence)
    val e = intercept[Exception](
      s.sql("SELECT minhash128(CAST(array() AS array<bigint>))").collect())
    def rootMsg(t: Throwable): String = {
      var c: Throwable = t
      while (c.getCause != null) c = c.getCause
      Option(c.getMessage).getOrElse("")
    }
    assert(rootMsg(e).contains("empty shingle set"), rootMsg(e))
    // shingle_poly3/shingle_hash3 SKIP null tokens (previously: NPE
    // interpreted, silent ""-hash under Tungsten) — the null-bearing
    // array must shingle exactly like its null-stripped twin, on the
    // SQL (Tungsten) path and via direct compute (interpreted path)
    val withNull = Seq((Seq(Some("a"), None, Some("b"), Some("c"),
      Some("d")): Seq[Option[String]])).toDF("t")
    val stripped = Seq((Seq("a", "b", "c", "d"))).toDF("t")
    Seq("shingle_poly3", "shingle_hash3").foreach { f =>
      val got = withNull.select(expr(s"$f(t)")).head.getSeq[Long](0)
      val want = stripped.select(expr(s"$f(t)")).head.getSeq[Long](0)
      assert(got == want, s"$f null-skip mismatch: $got vs $want")
    }
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import org.apache.spark.unsafe.types.UTF8String
    val interp = new GenericArrayData(Array[Any](
      UTF8String.fromString("a"), null, UTF8String.fromString("b"),
      UTF8String.fromString("c"), UTF8String.fromString("d")))
    val interpStripped = new GenericArrayData(Array[Any](
      UTF8String.fromString("a"), UTF8String.fromString("b"),
      UTF8String.fromString("c"), UTF8String.fromString("d")))
    assert(PolyShingle3.compute(interp).toSeq ==
      PolyShingle3.compute(interpStripped).toSeq)
    assert(ShingleHash3.compute(interp).toSeq ==
      ShingleHash3.compute(interpStripped).toSeq)
  }

  test("shingle_poly3 matches the direct codepoint fold of each shingle string") {
    val s = spark
    import s.implicits._
    def fold(str: String): Long = {
      var h = BigInt(0)
      str.codePoints().toArray.foreach { cp =>
        h = (h * Mersenne61.B + cp) % P
      }
      h.toLong
    }
    val toks = Seq("aa", "bb", "cc", "d😀") // incl. astral char
    val expect = toks.sliding(3)
      .map(w => fold(w.mkString(" "))).toSeq.distinct.sorted
    val got = Seq(Tuple1(toks)).toDF("t")
      .select(expr("shingle_poly3(t)").as("s"))
      .collect().head.getSeq[Long](0)
    assert(got == expect, s"got=$got expect=$expect")
    // short arrays yield the empty set; values live in [0, p)
    val empty = Seq(Tuple1(Seq("one", "two"))).toDF("t")
      .select(expr("shingle_poly3(t)").as("s"))
      .collect().head.getSeq[Long](0)
    assert(empty.isEmpty)
    assert(got.forall(u => u >= 0 && u < Mersenne61.P))
  }
}
