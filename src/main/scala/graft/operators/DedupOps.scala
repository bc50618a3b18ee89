package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.sources.Tables

/** Deduplication (SURVEY §E) — exact and near-dup detection over
  * `documents` / `embeddings`, the core curation stage of an LLM
  * training-data pipeline.
  *
  * Algorithms are the published classics: MinHash resemblance
  * sketches (Broder, "On the resemblance and containment of
  * documents", 1997) with banded LSH (Indyk–Motwani 1998; banding
  * analysis as in Mining of Massive Datasets ch. 3), and SimHash
  * (Charikar, "Similarity estimation techniques from rounding
  * algorithms", 2002) with the Hamming-pigeonhole candidate trick
  * (Manku–Jain–Sarma, "Detecting near-duplicates for web crawling",
  * 2007).
  *
  * Scale design (SURVEY §5): NOTHING here is a global cross join.
  *  - exact: one hash aggregation on the content fingerprint.
  *  - ngram-jaccard: pairwise comparison only WITHIN (lang,
  *    length-band) blocks — the self-join shuffles on the block key.
  *  - minhash: MinHash(128) signatures, 32-band LSH; candidate pairs
  *    come from equi-joins on (band, band_hash) buckets, then exact
  *    jaccard runs only on candidates. This is the 100 TB path.
  *  - simhash: 64-bit signature, 4×16-bit chunk pigeonhole buckets
  *    (hamming ≤3 ⟹ some chunk equal), exact hamming on candidates.
  *  - embedding: cosine pairs only within label blocks; decimal-exact
  *    dot products so the DuckDB oracle hashes identically.
  */
object DedupOps extends Suite {

  import Tok.{toks, toksSql}

  /** DuckDB twin of the 3-gram shingle set (the oracle works on the
    * shingle strings; Spark works on their hashes — jaccard counts
    * are identical since hashing preserves set identity). */
  private[operators] val shinglesSqlExpr =
    "list_distinct([t[i] || ' ' || t[i+1] || ' ' || t[i+2] for i in range(1, len(t) - 1)])"

  // ---- dedup_exact: md5 fingerprint groups --------------------------
  private def dedupExact(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .groupBy(md5(col("text")).as("fp"))
      .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("keep_id"))
      .orderBy("fp")

  private val dedupExactSql =
    """SELECT md5(text) AS fp, COUNT(*) AS n_docs, MIN(doc_id) AS keep_id
      |FROM documents GROUP BY 1 ORDER BY fp""".stripMargin

  /** Shingle sets as long hashes via the native shingle_hash3
    * Expression (one codegen'd pass, no intermediate shingle strings;
    * see graft.functions.ShingleHash3). Set jaccard is preserved
    * (collisions ~2^-64 per pair) and every downstream consumer
    * (jaccard counts, MinHash) works on fixed-size longs. */
  private[operators] def hashedShingles(spark: SparkSession, dir: String): DataFrame =
    hashedShinglesOf(Tables.documents(spark, dir))

  /** The ONE shingle construction (tokenize → (lang, len/50) block →
    * shingle_hash3), frame-parameterized so the table-bound query
    * path and the lakehouse change-feed path (PipelineOps
    * .incrementalDedupFrames) cannot drift — a retuned band width or
    * shingle expression applies to both or neither. */
  private[operators] def hashedShinglesOf(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"), col("lang"), toks.as("t"))
      .select(col("doc_id"), col("lang"),
        (size(col("t")).cast("long") / 50).cast("long").as("band"),
        expr("shingle_hash3(t)").as("s"))

  // ---- dedup_ngram_jaccard: blocked pairwise shingle jaccard --------
  // Co-occurrence form: explode shingle hashes and equi-join on the
  // hash (+ block key), so |A∩B| is a count per pair and the shuffle
  // carries narrow (hash, doc, n) rows — never the full shingle
  // arrays (the array-carrying pair join ships ~4 KB per pair and is
  // an order of magnitude slower). Pairs sharing zero shingles never
  // materialize. Block key = (lang, n_tokens div 50); the size-ratio
  // join predicate (j ≥ 0.5 ⇒ |big| ≤ 2|small|) prunes pairs without
  // changing results. τ = 0.5. Hot-shingle skew is AQE-split here; at
  // 100 TB the minhash op below is the intended path.
  /** Near-dup pairs (a_id < b_id, unrounded jaccard ≥ 0.5) — the
    * shared core of dedup_ngram_jaccard and PipelineOps' curation
    * drop-list. */
  private[operators] def jaccardPairs(spark: SparkSession, dir: String): DataFrame =
    jaccardPairsAt(spark, dir, 0.5)

  /** The same blocked co-occurrence pair join at an arbitrary jaccard
    * floor — dedup_edit uses a loose floor (0.05) as its CANDIDATE
    * generator before edit-distance verification. */
  /** The ONE persisted exploded-shingle frame (doc_id, lang, band,
    * n, h) — every pair generator (jaccard, containment, the §H
    * composites through them) joins over this, so the interpreted
    * shingle construction (tokenize→3-gram→hash, the expensive part)
    * runs once per session (CacheManager dedupes the identical plan
    * across calls). */
  private def explodedShingles(spark: SparkSession, dir: String): DataFrame =
    hashedShingles(spark, dir)
      .select(col("doc_id"), col("lang"), col("band"),
        size(col("s")).as("n"), explode(col("s")).as("h"))
      .persist()

  private[operators] def jaccardPairsAt(
      spark: SparkSession, dir: String, tau: Double): DataFrame = {
    val ex = explodedShingles(spark, dir)
    val a = ex.select(col("h"), col("lang"), col("band"),
      col("doc_id").as("a_id"), col("n").as("na"))
    val b = ex.select(col("h"), col("lang"), col("band"),
      col("doc_id").as("b_id"), col("n").as("nb"))
    a.join(b, Seq("h", "lang", "band"))
      .filter(col("a_id") < col("b_id") &&
        col("na") <= col("nb") * 2 && col("nb") <= col("na") * 2)
      .groupBy("a_id", "b_id", "na", "nb")
      .agg(count(lit(1)).as("inter"))
      // filter on the UNROUNDED ratio, round only in the projection —
      // the oracle's WHERE runs before its ROUND, so filtering the
      // rounded value would admit pairs in [τ-5e-7, τ) it rejects
      .withColumn("jaccard", col("inter").cast("double") /
        (col("na") + col("nb") - col("inter")))
      .filter(col("jaccard") >= tau)
  }

  private def dedupNgramJaccard(spark: SparkSession, dir: String): DataFrame =
    jaccardPairs(spark, dir)
      .select(col("a_id"), col("b_id"), round(col("jaccard"), 6).as("jaccard"))
      .orderBy("a_id", "b_id")

  /** DuckDB twin of [[jaccardPairs]] (SELECT fragment yielding
    * a_id, b_id and the unrounded jaccard) — the ONE place the pair
    * SQL lives; dedup_ngram_jaccard's oracle and PipelineOps'
    * curation oracle both derive from it. The WHERE filters the
    * UNROUNDED ratio, matching the Spark side. */
  private[operators] def jaccardPairsSqlAt(tau: String): String =
    s"""SELECT a.doc_id AS a_id, b.doc_id AS b_id,
      |  CAST(len(list_intersect(a.s, b.s)) AS DOUBLE) /
      |    len(list_distinct(list_concat(a.s, b.s))) AS jaccard
      |FROM (SELECT doc_id, lang, CAST(len(t) // 50 AS BIGINT) AS band,
      |        $shinglesSqlExpr AS s
      |      FROM (SELECT doc_id, lang, $toksSql AS t FROM documents) x) a
      |JOIN (SELECT doc_id, lang, CAST(len(t) // 50 AS BIGINT) AS band,
      |        $shinglesSqlExpr AS s
      |      FROM (SELECT doc_id, lang, $toksSql AS t FROM documents) x) b
      |  ON a.lang = b.lang AND a.band = b.band AND a.doc_id < b.doc_id
      |  AND len(a.s) <= len(b.s) * 2 AND len(b.s) <= len(a.s) * 2
      |WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE) /
      |    len(list_distinct(list_concat(a.s, b.s))) >= $tau""".stripMargin

  // the size-ratio join predicate is mathematically implied at
  // τ=0.5 (J ≥ ½ ⟹ max ≤ 2·min) so the canonical pair SQL is
  // unchanged by carrying it explicitly; at looser floors it is
  // load-bearing (the Spark side always prunes on it)
  private[operators] val jaccardPairsSql: String = jaccardPairsSqlAt("0.5")

  // NOTE: must be defined AFTER jaccardPairsSql — object vals
  // initialize top-to-bottom, and interpolating a not-yet-initialized
  // val silently embeds "null" in the SQL.
  private val dedupNgramJaccardSql =
    s"""SELECT a_id, b_id, ROUND(jaccard, 6) AS jaccard
      |FROM ($jaccardPairsSql) p
      |ORDER BY a_id, b_id""".stripMargin

  // ---- dedup_minhash: MinHash(128) + 32-band LSH --------------------
  // sig[k] = min over shingles u of (h1(u) + k·h2(u)) mod (2^61−1) —
  // Kirsch–Mitzenmacher double hashing over two Carter–Wegman
  // universal hashes (Broder 1997 / MMDS ch.3 family) of
  // shingle_poly3's polynomial codepoint hashes, computed by the
  // native minhash128 Expression: all 128 rows in one codegen'd pass
  // per doc (two modmuls + 127 adds per shingle) — no explode, no
  // 128-buffer aggregation, no shuffle.
  // Band buckets are the raw 4-row signature slices themselves
  // (band j keys on (j, sig[4j..4j+3]) — no band hash at all, so
  // nothing hash-engine-specific remains); candidates = pairs
  // sharing any band slice; exact jaccard verifies candidates only.
  // HASH-VERIFIED since r10: both the shingle universe hash and the
  // minhash family are exact mod-p integer arithmetic a SQL engine
  // replays from the embedded (a_k, b_k) literals, so the DuckDB
  // oracle reproduces signatures, bands, candidate set, and jaccards
  // bit-for-bit (previously xxhash64-based ⇒ rows-only).
  private def dedupMinhash(spark: SparkSession, dir: String): DataFrame =
    minhashPairs(spark, dir).orderBy("a_id", "b_id")

  /** The verified minhash-LSH pair frame — shared by dedup_minhash
    * (its direct output) and dedup_minhash_recall (its measured
    * side). */
  private[operators] def minhashPairs(spark: SparkSession,
      dir: String): DataFrame = {
    // The shingle stage feeds both bucket-join sides AND the verify
    // joins; persist it once (Spark's CacheManager dedupes identical
    // plans, so repeated calls share one entry). ~2 KB/doc — at
    // 100 TB this stage would be an explicit checkpoint table.
    val d = Tables.documents(spark, dir)
      .select(col("doc_id"), toks.as("t"))
      .select(col("doc_id"), expr("shingle_poly3(t)").as("s"))
      .filter(size(col("s")) > 0)
      .persist()
    val sigs = d.select(col("doc_id"), expr("minhash128(s)").as("sig"))
    val bandCols = (0 until 32).map(j =>
      struct((0 until 4).map(r =>
        element_at(col("sig"), 4 * j + r + 1).as(s"s$r")): _*))
    val buckets = sigs
      .select(col("doc_id"), posexplode(array(bandCols: _*)).as(Seq("band", "bh")))
    val cand = buckets.as("x").join(buckets.as("y"),
        col("x.band") === col("y.band") && col("x.bh") === col("y.bh") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a_id"), col("y.doc_id").as("b_id"))
      .distinct()
    val sh = d.select(col("doc_id"), col("s"), size(col("s")).as("n"))
    cand
      .join(sh.select(col("doc_id").as("a_id"), col("s").as("sa"),
        col("n").as("na")), Seq("a_id"))
      .join(sh.select(col("doc_id").as("b_id"), col("s").as("sb"),
        col("n").as("nb")), Seq("b_id"))
      .withColumn("inter", size(array_intersect(col("sa"), col("sb"))))
      .withColumn("jaccard", col("inter").cast("double") /
        (col("na") + col("nb") - col("inter")))
      .filter(col("jaccard") >= 0.5)
      .select(col("a_id"), col("b_id"), round(col("jaccard"), 6).as("jaccard"))
  }

  /** The DuckDB replay of the FULL minhash pipeline — polynomial
    * codepoint shingle hashes (PolyShingle3's fold, char by char),
    * the 128-seed universal family from the embedded (a_k, b_k)
    * literals, raw 4-row band buckets, candidate join, and exact
    * jaccard over the same u-value sets. Everything is exact mod-p
    * integer arithmetic (HUGEINT intermediates), so signatures and
    * candidate sets are bit-identical cross-engine. Yields
    * `mh_pairs(a_id, b_id, jaccard)` with the UNROUNDED jaccard.
    * Shared by dedup_minhash's oracle and dedup_minhash_recall's
    * found-side. */
  private[operators] val mhPairsCtes: String = {
    import graft.functions.{Mersenne61 => M61, MinHash128 => MH}
    s"""mh_toks AS (SELECT doc_id, $toksSql AS t FROM documents),
      |mh_sets AS (
      |  SELECT doc_id, list_distinct(list_transform(
      |    [t[i] || ' ' || t[i+1] || ' ' || t[i+2]
      |     for i in range(1, len(t) - 1)],
      |    s -> CAST(list_reduce(list_prepend(CAST(0 AS HUGEINT),
      |           list_transform(range(1, length(s) + 1),
      |             i -> CAST(ord(s[i]) AS HUGEINT))),
      |           (a, c) -> (a * ${graft.functions.Mersenne61.B} + c)
      |             % ${M61.P}) AS BIGINT))) AS s
      |  FROM mh_toks WHERE len(t) >= 3),
      |mh_u AS (SELECT doc_id, unnest(s) AS u FROM mh_sets),
      |mh_h AS (
      |  SELECT doc_id, u,
      |    CAST((CAST(${MH.seedsA(0)} AS HUGEINT) * u + ${MH.seedsB(0)})
      |      % ${M61.P} AS BIGINT) AS h1,
      |    CAST((CAST(${MH.seedsA(1)} AS HUGEINT) * u + ${MH.seedsB(1)})
      |      % ${M61.P} AS BIGINT) AS h2
      |  FROM mh_u),
      |mh_sigs AS (
      |  SELECT doc_id, k,
      |    MIN(CAST((h1 + CAST(k AS HUGEINT) * h2) % ${M61.P} AS BIGINT))
      |      AS sig
      |  FROM mh_h, range(0, ${MH.K}) r(k) GROUP BY doc_id, k),
      |mh_bands AS (
      |  SELECT doc_id, k // 4 AS band,
      |    MIN(CASE WHEN k % 4 = 0 THEN sig END) AS s0,
      |    MIN(CASE WHEN k % 4 = 1 THEN sig END) AS s1,
      |    MIN(CASE WHEN k % 4 = 2 THEN sig END) AS s2,
      |    MIN(CASE WHEN k % 4 = 3 THEN sig END) AS s3
      |  FROM mh_sigs GROUP BY doc_id, k // 4),
      |mh_cand AS (
      |  SELECT DISTINCT x.doc_id AS a_id, y.doc_id AS b_id
      |  FROM mh_bands x JOIN mh_bands y
      |    ON x.band = y.band AND x.s0 = y.s0 AND x.s1 = y.s1
      |    AND x.s2 = y.s2 AND x.s3 = y.s3 AND x.doc_id < y.doc_id),
      |mh_pairs AS (
      |  SELECT c.a_id, c.b_id,
      |    CAST(len(list_intersect(ua.s, ub.s)) AS DOUBLE) /
      |      (len(ua.s) + len(ub.s) - len(list_intersect(ua.s, ub.s)))
      |      AS jaccard
      |  FROM mh_cand c
      |  JOIN mh_sets ua ON ua.doc_id = c.a_id
      |  JOIN mh_sets ub ON ub.doc_id = c.b_id)""".stripMargin
  }

  private val dedupMinhashSql: String =
    s"""WITH $mhPairsCtes
      |SELECT a_id, b_id, ROUND(jaccard, 6) AS jaccard
      |FROM mh_pairs WHERE jaccard >= 0.5
      |ORDER BY a_id, b_id""".stripMargin

  // ---- dedup_minhash_recall: the banded-LSH S-curve, measured --------
  // The tuning report behind every (bands, rows) choice (Broder/MMDS
  // ch.3: P(candidate | s) = 1 − (1 − s^r)^b — theory gives the
  // S-curve, THIS measures it): exact τ=0.5 jaccard pairs (the
  // blocked-join ground truth dedup_ngram_jaccard hash-verifies)
  // split into similarity bands, each band reporting how many pairs
  // the 32-band/4-row MinHash LSH path actually surfaced. Precision
  // is 1.0 by construction (candidates are exact-verified — the spec
  // pins it with a set-difference); recall per band is the number a
  // pipeline trades against candidate volume when it re-tunes
  // (bands, rows) for a new corpus. The denominator is the BLOCKED
  // ground truth (lang + size band — what the exact pipeline would
  // dedupe); minhash itself is unblocked and may surface extra
  // cross-block τ-pairs, which are precision-safe (exact-verified)
  // and outside this denominator by construction. HASH-VERIFIED
  // since r10 (the universal mod-p family made the found-side
  // replayable; the exact side always was): the oracle reproduces
  // the whole measured S-curve. The invariant spec additionally
  // pins band partitioning, bounds, per-pair verified precision,
  // and the S-curve's rising tail.
  // Scale: pure composition of two already-bucketed pair frames +
  // one band-sized agg; the pair join keys on (a_id, b_id) — both
  // sides are pair-sized, never corpus².
  private def dedupMinhashRecall(spark: SparkSession,
      dir: String): DataFrame = {
    val exact = jaccardPairs(spark, dir)
      .select(col("a_id"), col("b_id"), col("jaccard"))
    val mh = minhashPairs(spark, dir)
      .select(col("a_id"), col("b_id"), lit(1L).as("found"))
    exact.join(mh, Seq("a_id", "b_id"), "left")
      .withColumn("band",
        least(floor(col("jaccard") * 10).cast("long"), lit(9L)))
      .groupBy("band")
      .agg(count(lit(1)).as("n_pairs"),
        count(col("found")).as("n_found"))
      .withColumn("recall",
        expr("(2 * n_found * 1000000 + n_pairs) div (2 * n_pairs)")
          .cast("double") / 1000000L)
      .orderBy("band")
  }

  /** Oracle for the measured S-curve: the exact blocked ground truth
    * (the shared jaccard-pair SQL) left-joined to the replayed
    * minhash pair set; the banding floor and the half-up integer
    * recall rounding mirror the Spark expressions exactly (counts
    * and the jaccard double are bit-identical, so the band floor
    * can't flip). */
  private val dedupMinhashRecallSql: String =
    s"""WITH $mhPairsCtes,
      |exact AS ($jaccardPairsSql),
      |found AS (SELECT a_id, b_id FROM mh_pairs WHERE jaccard >= 0.5),
      |joined AS (
      |  SELECT LEAST(CAST(FLOOR(e.jaccard * 10) AS BIGINT), 9) AS band,
      |    CASE WHEN f.a_id IS NOT NULL THEN 1 END AS found
      |  FROM exact e LEFT JOIN found f
      |    ON e.a_id = f.a_id AND e.b_id = f.b_id),
      |g AS (
      |  SELECT band, COUNT(*) AS n_pairs, COUNT(found) AS n_found
      |  FROM joined GROUP BY band)
      |SELECT band, n_pairs, n_found,
      |  CAST((2 * n_found * 1000000 + n_pairs) // (2 * n_pairs)
      |    AS DOUBLE) / 1000000 AS recall
      |FROM g ORDER BY band""".stripMargin

  // ---- dedup_simhash: 64-bit simhash + hamming ≤ 3 ------------------
  // Signature via the native codegen'd simhash64 Expression
  // (graft.functions.SimHash64, registered by GraftExtensions): one
  // map-only pass per document — no explode, no aggregation shuffle.
  // HASH-VERIFIED since r10: the per-token bits are Carter–Wegman
  // mod-(2^61−1) arithmetic over poly-fold universe hashes (was
  // xxhash64 ⇒ rows-only), so the DuckDB oracle replays signatures,
  // block keys, candidate set, and hammings bit-for-bit
  // (simhashChainSql below).
  // Candidates via the Manku 2007 multi-table block construction,
  // GENERALIZED to a corpus-derived block count B (r11 — the last
  // compile-time blocking constant, VERDICT r10 item 2): split the
  // 64 bits into B near-even blocks and key each of the C(B,3)
  // (B−3)-block combinations. Hamming(a,b) ≤ 3 dirties at most 3 of
  // the B blocks, so ≥ B−3 blocks are clean and SOME table's full
  // combination matches exactly — recall 1.0 by pigeonhole at EVERY
  // B. The key widens as B grows (B=6 → ~31-bit keys, B=10 →
  // ~43-bit), so bucket collision mass n²/2^w stays sub-linear in n
  // when B is derived from the corpus count by the same
  // integer-comparison scheme as HyperplaneBuckets.derivePlanes:
  // min B with 2^(minKeyBits(B)−3) ≥ n, i.e. expected random
  // collision pairs per table ≤ n/8. B=6 (the historical registered
  // config, bit-identical keys) covers n ≤ 2^28 ≈ 2.7·10⁸ docs;
  // each step buys ~32–64×. Table count C(B,3) (20 → 120) is the
  // price of the widening — it grows the MAP-side explode, never
  // the within-bucket pair stage.

  /** Supported block counts. B=6 is the historical minimum; 10 caps
    * the C(B,3) table fan-out at 120 keys/doc. */
  private[graft] val simhashBlockCounts: Seq[Int] = 6 to 10

  /** Near-even split of 64 bits into `bb` blocks: the first
    * 64 mod bb blocks get ⌈64/bb⌉ bits, the rest ⌊64/bb⌋ —
    * bb=6 reproduces the historical (11,11,11,11,10,10). */
  private[graft] def simhashBlockLens(bb: Int): Seq[Int] = {
    val hi = (64 + bb - 1) / bb
    val nHi = if (64 % bb == 0) bb else 64 % bb
    Seq.fill(nHi)(hi) ++ Seq.fill(bb - nHi)(64 / bb)
  }
  private[graft] def simhashBlockOffsets(bb: Int): Seq[Int] =
    simhashBlockLens(bb).scanLeft(0)(_ + _).init
  /** Per-block slot width in the packed key (every block fits). */
  private[graft] def simhashShiftUnit(bb: Int): Int = (64 + bb - 1) / bb
  /** Narrowest key over the C(B,3) tables: 64 minus the 3 widest
    * excluded blocks — the width the derivation rule must bound. */
  private[graft] def simhashMinKeyBits(bb: Int): Int =
    64 - simhashBlockLens(bb).sorted.reverse.take(3).sum

  /** Corpus-count → block count: min B with expected random bucket
    * collision pairs per table n²/2^w ≤ n/8 ⇔ 2^(minKeyBits−3) ≥ n.
    * Pure integer comparisons (power-of-two exact), so the DuckDB
    * oracle derives the IDENTICAL B from the same COUNT. */
  private[graft] def deriveSimhashBlocks(n: Long): Int =
    simhashBlockCounts
      .find(bb => (1L << (simhashMinKeyBits(bb) - 3)) >= n)
      .getOrElse(simhashBlockCounts.last)

  /** SQL twin of [[deriveSimhashBlocks]] given a scalar COUNT
    * subquery (embedded by simhashChainSql). */
  private[graft] def deriveSimhashBlocksSql(countSubquery: String): String = {
    val rows = simhashBlockCounts
      .map(bb => s"($bb,${simhashMinKeyBits(bb)})").mkString(", ")
    s"""(SELECT COALESCE(
      |  (SELECT MIN(bb) FROM (VALUES $rows) cfg(bb, minbits)
      |   WHERE (CAST(1 AS BIGINT) << (minbits - 3)) >= $countSubquery),
      |  ${simhashBlockCounts.last}))""".stripMargin
  }

  private[graft] def simhashTables(bb: Int): Seq[Seq[Int]] =
    (0 until bb).combinations(bb - 3).map(_.toSeq).toSeq // C(bb,3) tables

  /** Pure twin of the per-table bucket keys (the spec asserts the
    * pigeonhole property against this at every supported B; a
    * DataFrame parity test ties it to the column expressions
    * below). Included blocks pack ascending-index, MSB-first, in
    * fixed ⌈64/B⌉-bit slots — bb=6 is bit-identical to the
    * historical (block_i << 22 | block_j << 11 | block_k). */
  private[graft] def simhashKeys(sh: Long, bb: Int = 6): Seq[Long] = {
    val offs = simhashBlockOffsets(bb); val lens = simhashBlockLens(bb)
    val su = simhashShiftUnit(bb)
    def block(c: Int): Long = (sh >>> offs(c)) & ((1L << lens(c)) - 1)
    simhashTables(bb).map(_.foldLeft(0L)((k, c) => (k << su) | block(c)))
  }

  private[graft] def simhashKeyCols(bb: Int = 6): Seq[Column] = {
    val offs = simhashBlockOffsets(bb); val lens = simhashBlockLens(bb)
    val su = simhashShiftUnit(bb)
    def block(c: Int): Column =
      shiftrightunsigned(col("sh"), offs(c))
        .bitwiseAND(lit((1L << lens(c)) - 1))
    simhashTables(bb).map(_.foldLeft(lit(0L): Column)((k, c) =>
      shiftleft(k, su).bitwiseOR(block(c))))
  }

  /** Manku-bucketed hamming ≤ 3 pairs over ANY (doc_id, sh) frame —
    * shared by dedup_simhash (text signatures) and §G's
    * mm_phash_dedup (byte-level blob signatures). `bb` is the
    * corpus-derived block count (callers pass
    * [[LshWidth.simhashBlocks]]; default 6 = the historical width
    * for the fixed-width specs). */
  private[operators] def simhashPairs(d: DataFrame, bb: Int = 6): DataFrame = {
    val keyed = d.select(col("doc_id"), col("sh"),
      posexplode(array(simhashKeyCols(bb): _*)).as(Seq("tbl", "key")))
    keyed.as("x").join(keyed.as("y"),
        col("x.tbl") === col("y.tbl") && col("x.key") === col("y.key") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a_id"), col("y.doc_id").as("b_id"),
        bit_count(col("x.sh").bitwiseXOR(col("y.sh"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= 3)
      .orderBy("a_id", "b_id")
  }

  private def dedupSimhash(spark: SparkSession, dir: String): DataFrame =
    simhashPairs(Tables.documents(spark, dir)
      .select(col("doc_id"), toks.as("t"))
      .filter(size(col("t")) > 0)
      .select(col("doc_id"), expr("simhash64(t)").as("sh")),
      LshWidth.simhashBlocks(spark, dir))

  /** DuckDB reusable poly-fold: the base-131 codepoint polynomial mod
    * 2^61−1 of a string expression (Mersenne61.polyFold's twin);
    * `s` must be a simple reference (it appears three times). */
  private[operators] def polyFoldSql(s: String): String = {
    import graft.functions.{Mersenne61 => M61}
    s"""CAST(list_reduce(list_prepend(CAST(0 AS HUGEINT),
      |      list_transform(range(1, length($s) + 1),
      |        i -> CAST(ord($s[i]) AS HUGEINT))),
      |      (a, c) -> (a * ${M61.B} + c) % ${M61.P}) AS BIGINT)""".stripMargin
  }

  /** The simhash64 + Manku-block replay chain over a caller-provided
    * CTE `sh_src(id, t)` (t = LIST of strings to hash — tokens for
    * dedup_simhash, hex byte-4-grams for mm_phash_dedup): per-token
    * poly-fold universe hashes, the two universal hashes whose bit
    * slices are the 64 sign bits (h_1's 61 + h_2's low 3, from the
    * embedded (a_s, b_s) literals), the packed signed signature
    * (HUGEINT-assembled, then mapped to two's complement so xor/
    * bit_count agree with Spark's long), the CORPUS-DERIVED
    * B-block/C(B,3)-table pigeonhole keys (sh_b replays
    * deriveSimhashBlocks from `countSubquery` — the identical
    * integer rule, so Spark and the oracle always key at the same
    * B), and the hamming ≤ 3 pair set — everything exact integer
    * work, so the hash gate verifies the WHOLE simhash pipeline
    * INCLUDING the width derivation. Yields
    * `sh_out(a_id, b_id, hamming)`. */
  private[operators] def simhashChainSql(countSubquery: String): String = {
    import graft.functions.{Mersenne61 => M61, SimHash64 => SH}
    val bitRows = (0 until SH.BITS)
      .map(j => if (j < 61) s"($j,1,$j)" else s"($j,2,${j - 61})")
      .mkString(", ")
    // block + table definitions for EVERY supported B, filtered at
    // run time by the derived sh_b scalar — so ONE literal table
    // serves any corpus size, the prefix-of-wide-table idea applied
    // to blocking configs
    val blockRows = simhashBlockCounts.flatMap { bb =>
      simhashBlockOffsets(bb).zip(simhashBlockLens(bb)).zipWithIndex
        .map { case ((off, len), c) => s"($bb,$c,$off,$len)" }
    }.mkString(", ")
    val tableRows = simhashBlockCounts.flatMap { bb =>
      simhashTables(bb).zipWithIndex.flatMap { case (cs, t) =>
        cs.map(c => s"($bb,$t,$c)")
      }
    }.mkString(", ")
    val suRows = simhashBlockCounts
      .map(bb => s"($bb,${simhashShiftUnit(bb)})").mkString(", ")
    s"""sh_bitdef(j, src, shift) AS (VALUES $bitRows),
      |sh_blockdef(bb, c, off, len) AS (VALUES $blockRows),
      |sh_tabledef(bb, tbl, c) AS (VALUES $tableRows),
      |sh_sudef(bb, su) AS (VALUES $suRows),
      |sh_b AS (SELECT ${deriveSimhashBlocksSql(countSubquery)} AS bb),
      |sh_su AS (SELECT su FROM sh_sudef
      |  WHERE bb = (SELECT bb FROM sh_b)),
      |sh_u AS (
      |  SELECT id, ${polyFoldSql("tok")} AS u
      |  FROM (SELECT id, unnest(t) AS tok FROM sh_src) x),
      |sh_h AS (
      |  SELECT id,
      |    CAST((CAST(${SH.seedsA(0)} AS HUGEINT) * u + ${SH.seedsB(0)})
      |      % ${M61.P} AS BIGINT) AS h1,
      |    CAST((CAST(${SH.seedsA(1)} AS HUGEINT) * u + ${SH.seedsB(1)})
      |      % ${M61.P} AS BIGINT) AS h2
      |  FROM sh_u),
      |sh_bits AS (
      |  SELECT h.id, d.j,
      |    SUM(CASE WHEN ((CASE WHEN d.src = 1 THEN h.h1 ELSE h.h2 END)
      |      >> d.shift) % 2 = 1 THEN 1 ELSE -1 END) AS cnt
      |  FROM sh_h h, sh_bitdef d GROUP BY 1, 2),
      |sh_sigs AS (
      |  SELECT id, CAST(CASE WHEN su >= ${BigInt(2).pow(63)}
      |      THEN su - ${BigInt(2).pow(64)} ELSE su END AS BIGINT) AS sh
      |  FROM (
      |    SELECT id, SUM(CASE WHEN cnt > 0
      |        THEN CAST(1 AS HUGEINT) << j ELSE CAST(0 AS HUGEINT) END)
      |      AS su
      |    FROM sh_bits GROUP BY id) g),
      |sh_blocks AS (
      |  SELECT b.id, d.c,
      |    CAST(SUM(CASE WHEN b.j >= d.off AND b.j < d.off + d.len
      |        AND b.cnt > 0
      |      THEN CAST(1 AS BIGINT) << (b.j - d.off) ELSE 0 END)
      |      AS BIGINT) AS v
      |  FROM sh_bits b, sh_blockdef d
      |  WHERE d.bb = (SELECT bb FROM sh_b)
      |  GROUP BY 1, 2),
      |sh_sel AS (
      |  SELECT tbl, c,
      |    COUNT(*) OVER (PARTITION BY tbl)
      |      - ROW_NUMBER() OVER (PARTITION BY tbl ORDER BY c) AS pos
      |  FROM sh_tabledef WHERE bb = (SELECT bb FROM sh_b)),
      |sh_keys AS (
      |  SELECT bl.id, s.tbl,
      |    CAST(SUM(bl.v << ((SELECT su FROM sh_su) * s.pos))
      |      AS BIGINT) AS key
      |  FROM sh_sel s JOIN sh_blocks bl ON bl.c = s.c
      |  GROUP BY 1, 2),
      |sh_cand AS (
      |  SELECT DISTINCT x.id AS a_id, y.id AS b_id
      |  FROM sh_keys x JOIN sh_keys y
      |    ON x.tbl = y.tbl AND x.key = y.key AND x.id < y.id),
      |sh_out AS (
      |  SELECT c.a_id, c.b_id,
      |    CAST(bit_count(xor(sa.sh, sb.sh)) AS INT) AS hamming
      |  FROM sh_cand c
      |  JOIN sh_sigs sa ON sa.id = c.a_id
      |  JOIN sh_sigs sb ON sb.id = c.b_id
      |  WHERE bit_count(xor(sa.sh, sb.sh)) <= 3)""".stripMargin
  }

  private val dedupSimhashSql: String =
    s"""WITH sh_src AS (
      |  SELECT doc_id AS id, t
      |  FROM (SELECT doc_id, $toksSql AS t FROM documents) x
      |  WHERE len(t) > 0),
      |${simhashChainSql(LshWidth.docsCountSql)}
      |SELECT a_id, b_id, hamming FROM sh_out
      |ORDER BY a_id, b_id""".stripMargin

  // ---- dedup_embedding: LSH-bucketed cosine near-dup pairs ----------
  // Candidate generation is multi-table random-hyperplane LSH
  // (Charikar 2002; multi-table amplification per Indyk–Motwani
  // 1998): 24 tables × 6 sign bits via the codegen'd
  // hyperplane_buckets Expression, pair-join keyed on
  // (label, tbl, key) — NEVER on bare label, whose within-block pair
  // count is quadratic in corpus size. Survivors get the exact
  // decimal cosine (double prefilter first), τ = 0.4.
  //
  // The DuckDB oracle replays the SAME bucket construction — dyadic
  // k/1024 plane weights as integer literals, the same left-fold
  // double dot (list_reduce) — so sign decisions, candidate sets and
  // cosines are bit-identical cross-engine and the hash gate verifies
  // the whole LSH pipeline, not just the final arithmetic.
  //
  // Candidate recall vs the exact all-pairs set is a measured,
  // tunable quality: this table's qualifying pairs are the extreme
  // tail of an isotropic distribution (within-label mean cosine 0.0,
  // passing pairs 0.40–0.51), where sign-LSH collision odds are
  // p₁=0.63 vs p₂=0.5 — ρ=ln p₁⁻¹/ln 2 ≈ 0.66, so NO parameter
  // choice gives recall 1.0 with real pruning at τ=0.4; measured at
  // sf0.1: recall 0.895 of 86 exact pairs, 3.1× fewer candidate
  // pairs (OperatorInvariantSpec pins the recall floor). At a
  // production near-dup threshold (τ ≥ 0.8, p₁ ≥ 0.86) the same
  // construction reaches recall ≈ 1 with 10-30× pruning.
  //
  // SCALE KNOB (measured, SCALE.md r8; AUTO-DERIVED since r10): 6-bit
  // keys = 64 buckets per (label, table), and the within-bucket pair
  // stage is quadratic in bucket size — the 10× stress run measured
  // 21.8× cost from keyspace saturation alone. The registered query
  // now keys at LshWidth.labelPlanes (min p ≥ 6 with 2^p·8 ≥ max
  // label count — one narrow count aggregate, memoized per dir), so
  // the keyspace grows with the corpus instead of saturating; the
  // oracle derives the IDENTICAL width in SQL from the identical
  // count and replays the full wide plane table as literals, keeping
  // every width hash-verified end to end (dedup_simhash's ~32-bit
  // Manku keys are the same principle, there via key construction).
  import graft.functions.VectorMath.dotDec
  import graft.functions.{HyperplaneBuckets => HB}

  private def dedupEmbedding(spark: SparkSession, dir: String): DataFrame =
    embeddingPairs(spark, dir).orderBy("a_id", "b_id")

  /** Width-scaled variant for the keyspace-growth spec: wider keys
    * must shrink the candidate set while every emitted pair stays a
    * true τ-pair (precision 1.0 holds at ANY width — candidates are
    * exact-verified — so the only quality axis a width change moves
    * is recall, which multi-table amplification buys back). */
  private[graft] def embeddingPairsAt(spark: SparkSession, dir: String,
      planes: Int): DataFrame = embeddingPairs(spark, dir, planes)

  /** The (a_id, b_id, cosine) near-dup pair frame at the 0.4 floor —
    * shared by dedup_embedding (its direct output) and
    * dedup_embedding_sweep (its aggregation input), so the sweep's
    * counts are over exactly the hash-verified pairs. `planes` is the
    * corpus-growth knob (header + HyperplaneBuckets scaladoc): the
    * registered query derives it from the max label count
    * (LshWidth.labelPlanes, planes ≤ 0 sentinel), so a 10×-grown
    * corpus runs the SAME frame ~3 bits wider and keeps bucket
    * sizes — and therefore the pair stage — constant-per-vector;
    * explicit widths remain for the keyspace-growth spec. */
  private def embeddingPairs(spark: SparkSession, dir: String,
      planes: Int = 0): DataFrame = {
    val width =
      if (planes > 0) planes else LshWidth.labelPlanes(spark, dir)
    val dims = 0 until 64
    val e = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("label"), col("embedding").as("v"))
      .withColumn("norm", dotDec(col("v"), col("v")))
    // bucket rows are narrow (id, label, tbl, key) — the vector never
    // rides the candidate shuffle
    val keyed = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("label"),
        posexplode(expr(s"hyperplane_buckets(embedding, $width)"))
          .as(Seq("tbl", "key")))
    val candPairs = keyed.as("x").join(keyed.as("y"),
        col("x.label") === col("y.label") && col("x.tbl") === col("y.tbl") &&
          col("x.key") === col("y.key") && col("x.vec_id") < col("y.vec_id"))
      .select(col("x.vec_id").as("a_id"), col("y.vec_id").as("b_id"))
      .distinct()
    // double prefilter on flat columns (codegen'd multiply-adds) at
    // τ−1e-6 — double vs decimal cosine differ ≪1e-9, so no survivor
    // of the exact test is lost; decimal runs only on survivors
    def flat(p: String) = e.select(
      Seq(col("vec_id").as(s"${p}_id"), col("norm").as(s"${p}n")) ++
        dims.map(i => element_at(col("v"), i + 1).cast("double").as(s"$p$i")): _*)
    val approxDot = dims.map(i => col(s"a$i") * col(s"b$i")).reduce(_ + _)
    val prefiltered = candPairs
      .join(flat("a"), Seq("a_id")).join(flat("b"), Seq("b_id"))
      .filter(approxDot / (sqrt(col("an")) * sqrt(col("bn"))) >= 0.4 - 1e-6)
      .select("a_id", "b_id", "an", "bn")
    val vecs = e.select(col("vec_id"),
      graft.functions.VectorMath.quantized(col("v")).as("v"))
    prefiltered
      .join(vecs.select(col("vec_id").as("a_id"), col("v").as("av")),
        Seq("a_id"))
      .join(vecs.select(col("vec_id").as("b_id"), col("v").as("bv")),
        Seq("b_id"))
      .withColumn("cosine",
        graft.functions.VectorMath.dotQ(col("av"), col("bv")) /
          (sqrt(col("an")) * sqrt(col("bn"))))
      .filter(col("cosine") >= 0.4)
      .select(col("a_id"), col("b_id"), round(col("cosine"), 6).as("cosine"))
  }

  // ---- dedup_embedding_sweep: cosine-threshold tuning curve ---------
  // pipe_threshold_sweep's analog for the embedding path: pair counts
  // at each candidate τ from ONE pass over the LSH candidate pairs —
  // the curve a curation team reads before pinning the near-dup
  // threshold (τ too low merges topical neighbors, too high misses
  // paraphrases). One conditional-count aggregate over the shared
  // hash-verified pair frame (never one scan per τ), exploded to a
  // row per threshold. Counts are over the rounded cosine exactly as
  // dedup_embedding emits it, so the curve is reproducible from its
  // output alone.
  private val cosineTaus: Seq[Double] = (40 to 90 by 5).map(_ / 100.0)

  private def dedupEmbeddingSweep(spark: SparkSession, dir: String): DataFrame = {
    val pairs = embeddingPairs(spark, dir)
    val agg = pairs.agg(
      count(when(col("cosine") >= cosineTaus.head, lit(1)))
        .as(s"c${(cosineTaus.head * 100).round}"),
      cosineTaus.tail.map(t =>
        count(when(col("cosine") >= t, lit(1))).as(s"c${(t * 100).round}")): _*)
    agg.select(explode(array(cosineTaus.map { t =>
        struct(lit(t).as("tau"),
          col(s"c${(t * 100).round}").cast("long").as("n_pairs"))
      }: _*)).as("r"))
      .select("r.*")
      .orderBy("tau")
  }

  /** planes→pw→sgn→keys: the oracle-side replay of hyperplane_buckets
    * AT THE DERIVED WIDTH (same dyadic integer plane weights — the
    * full TABLES×MAXPLANES literal table — same left-fold double dot,
    * and the same integer width derivation from `countSubquery` that
    * the Spark side runs through LshWidth) — shared by the
    * embedding-pair chain, dedup_semantic's within-cluster blocking,
    * sim_ann_lsh, and sim_knn_graph. Bits p ≥ derived width are
    * never computed (`pl.p < pw.planes`), mirroring compute()'s
    * prefix loop. */
  private[operators] def hyperKeysCtes(countSubquery: String): String = {
    val planeRows = (0 until HB.TABLES * HB.MAXPLANES).map { i =>
      s"(${i / HB.MAXPLANES},${i % HB.MAXPLANES},[${HB.wide(i).mkString(",")}])"
    }.mkString(",\n")
    s"""planes(t, p, w) AS (VALUES
      |$planeRows),
      |pw(planes) AS (${HB.derivePlanesSql(countSubquery)}),
      |sgn AS (
      |  SELECT e.vec_id, pl.t, pl.p,
      |    CASE WHEN list_reduce(list_transform(range(1, 65),
      |      i -> COALESCE(CAST(e.embedding[i] AS DOUBLE), 0.0)
      |        * (CAST(pl.w[i] AS DOUBLE)/1024.0)),
      |      (a, b) -> a + b) >= 0 THEN 1 ELSE 0 END AS bit
      |  FROM embeddings e, planes pl, pw WHERE pl.p < pw.planes),
      |keys AS (
      |  SELECT vec_id, t,
      |    CAST(SUM(bit * (CAST(1 AS BIGINT) << (pw.planes - 1 - p)))
      |      AS BIGINT) AS key
      |  FROM sgn, pw GROUP BY vec_id, t, pw.planes)""".stripMargin
  }

  /** Candidate pairs → exact cosines: the oracle replays the bucket
    * join bit-for-bit on the `keys` CTE above, so candidate sets and
    * cosines are identical to the Spark path. The chain (through
    * `emb_pairs`) is shared with the dedup_embedding_sweep oracle. */
  private[operators] val embPairsCtes: String = {
    s"""${hyperKeysCtes(LshWidth.labelCountSql)},
      |cand AS (
      |  SELECT DISTINCT ea.vec_id AS a_id, eb.vec_id AS b_id
      |  FROM keys ka JOIN keys kb ON ka.t = kb.t AND ka.key = kb.key
      |  JOIN embeddings ea ON ea.vec_id = ka.vec_id
      |  JOIN embeddings eb ON eb.vec_id = kb.vec_id
      |    AND ea.label = eb.label AND ka.vec_id < kb.vec_id),
      |terms AS (
      |  SELECT vec_id, i,
      |    CAST(CAST(embedding[i] AS DOUBLE) AS DECIMAL(12,8)) AS d
      |  FROM embeddings, range(1, 65) r(i)),
      |norms AS (
      |  SELECT vec_id, CAST(SUM(d * d) AS DOUBLE) AS norm
      |  FROM terms GROUP BY vec_id),
      |dots AS (
      |  SELECT c.a_id, c.b_id, CAST(SUM(a.d * b.d) AS DOUBLE) AS dot
      |  FROM cand c
      |  JOIN terms a ON a.vec_id = c.a_id
      |  JOIN terms b ON b.vec_id = c.b_id AND b.i = a.i
      |  GROUP BY c.a_id, c.b_id),
      |emb_pairs AS (
      |  SELECT a_id, b_id, ROUND(cosine, 6) AS cosine FROM (
      |    SELECT d.a_id, d.b_id,
      |      d.dot / (sqrt(na.norm) * sqrt(nb.norm)) AS cosine
      |    FROM dots d
      |    JOIN norms na ON d.a_id = na.vec_id
      |    JOIN norms nb ON d.b_id = nb.vec_id) t
      |  WHERE cosine >= 0.4)""".stripMargin
  }

  private val dedupEmbeddingSql: String =
    s"""WITH $embPairsCtes
      |SELECT a_id, b_id, cosine FROM emb_pairs
      |ORDER BY a_id, b_id""".stripMargin

  private val dedupEmbeddingSweepSql: String = {
    val rows = cosineTaus.map { t =>
      s"""SELECT CAST($t AS DOUBLE) AS tau,
        |  CAST(COALESCE(SUM(CASE WHEN cosine >= CAST($t AS DOUBLE)
        |    THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_pairs
        |FROM emb_pairs""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""WITH $embPairsCtes
      |$rows
      |ORDER BY tau""".stripMargin
  }

  // ---- dedup_substring: exact repeated-substring spans --------------
  // The exact-substring dedup of Lee et al., "Deduplicating Training
  // Data Makes Language Models Better" (2021, arXiv:2107.06499):
  // mark every substring of ≥ k tokens that occurs more than once in
  // the corpus. The paper builds a single-machine suffix array; the
  // Spark-native equivalent is overlapping k-gram counting — a
  // duplicated substring of length ≥ k is exactly a maximal run of
  // duplicated k-grams, so (1) count every k-gram's corpus-wide
  // sites, (2) positions of grams with ≥2 sites mark [pos, pos+k-1]
  // as duplicated, (3) per doc, merge overlapping/adjacent intervals
  // into maximal spans (gaps-and-islands over a doc-partitioned
  // window). Gram generation is MAP-ONLY (explode + slice — no
  // window, no per-doc sort); the only shuffles are the gram census
  // and the narrow (doc, pos) span merge. At 100 TB the census/join
  // key becomes xxhash64(gram) (8-byte shuffle rows; a collision can
  // only over-mark one gram-length span) — IMPLEMENTED behind
  // `hashCensus` (SURVEY §5): the registered query keeps the string
  // census so the oracle stays replayable, and an identity spec pins
  // the hashed variant to byte-identical span output at bench SF. The
  // oracle replays grams from the shared tokenizer via list slicing.
  private val subK = 5 // span resolution: duplicated runs of ≥5 tokens

  /** Maximal duplicated spans (doc_id, span_start, span_end,
    * span_tokens) — shared by dedup_substring (its direct output) and
    * dedup_substring_scrub (its removal mask). With `hashCensus` the
    * census/probe key is xxhash64(gram) — the declared 100 TB form:
    * the census shuffle and the site-probe join carry 8-byte keys
    * instead of ~30-byte gram strings, identical plan shape. */
  private def dupSpanFrame(spark: SparkSession, dir: String,
      hashCensus: Boolean = false): DataFrame = {
    val t = Tables.documents(spark, dir)
      .select(col("doc_id"), toks.as("t"))
      .filter(size(col("t")) >= subK) // sequence(0, n<0) would descend
    // persisted: the census aggregate AND the site-probe side of the
    // join both consume the exploded gram frame — without the persist
    // the tokenize+slice pass runs twice per query
    val gramStr =
      array_join(slice(col("t"), col("pos") + 1, lit(subK)), " ")
    val grams = t
      .select(col("doc_id"), col("t"),
        explode(sequence(lit(0), size(col("t")) - lit(subK))).as("pos"))
      .select(col("doc_id"), col("pos"),
        (if (hashCensus) xxhash64(gramStr) else gramStr).as("gram"))
      .persist()
    val census = grams.groupBy("gram")
      .agg(count(lit(1)).as("n_sites"))
      .filter(col("n_sites") >= 2)
      .select("gram")
    val covered = grams.join(census, Seq("gram"))
      .select(col("doc_id"), col("pos").cast("long").as("s"),
        (col("pos") + subK - 1).cast("long").as("e"))
    val wPrev = Window.partitionBy("doc_id").orderBy("s")
      .rowsBetween(Window.unboundedPreceding, -1)
    val wRun = Window.partitionBy("doc_id").orderBy("s")
    covered
      .withColumn("pme", max(col("e")).over(wPrev))
      .withColumn("ni",
        when(col("pme").isNull || col("s") > col("pme") + 1, 1L).otherwise(0L))
      .withColumn("island", sum(col("ni")).over(wRun))
      .groupBy(col("doc_id"), col("island"))
      .agg(min(col("s")).as("span_start"), max(col("e")).as("span_end"))
      .select(col("doc_id"), col("span_start"), col("span_end"),
        (col("span_end") - col("span_start") + 1).as("span_tokens"))
  }

  private def dedupSubstring(spark: SparkSession, dir: String): DataFrame =
    dupSpanFrame(spark, dir).orderBy("doc_id", "span_start")

  /** The xxhash64-census variant, exposed for the identity spec that
    * proves it span-equivalent to the string census on real data. */
  private[graft] def dupSpansHashed(spark: SparkSession, dir: String): DataFrame =
    dupSpanFrame(spark, dir, hashCensus = true)
      .orderBy("doc_id", "span_start")

  /** CTE chain through `spans` — shared by the span listing and the
    * scrub oracle, so both replay the identical mask. */
  private val dupSpansCtes =
    s"""t AS (
      |  SELECT doc_id, $toksSql AS t FROM documents),
      |g AS (
      |  SELECT doc_id, CAST(j AS BIGINT) AS pos,
      |    array_to_string(t[(j + 1):(j + $subK)], ' ') AS gram
      |  FROM t, range(0, 100000) r(j) WHERE j <= len(t) - $subK),
      |census AS (
      |  SELECT gram FROM g GROUP BY gram HAVING COUNT(*) >= 2),
      |covered AS (
      |  SELECT g.doc_id, g.pos AS s, g.pos + ${subK - 1} AS e
      |  FROM g JOIN census USING (gram)),
      |isl AS (
      |  SELECT doc_id, s, e,
      |    CASE WHEN MAX(e) OVER (PARTITION BY doc_id ORDER BY s
      |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) IS NULL
      |      OR s > MAX(e) OVER (PARTITION BY doc_id ORDER BY s
      |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) + 1
      |    THEN 1 ELSE 0 END AS ni
      |  FROM covered),
      |isl2 AS (
      |  SELECT doc_id, s, e,
      |    SUM(ni) OVER (PARTITION BY doc_id ORDER BY s) AS island
      |  FROM isl),
      |spans AS (
      |  SELECT doc_id, CAST(MIN(s) AS BIGINT) AS span_start,
      |    CAST(MAX(e) AS BIGINT) AS span_end,
      |    CAST(MAX(e) - MIN(s) + 1 AS BIGINT) AS span_tokens
      |  FROM isl2 GROUP BY doc_id, island)""".stripMargin

  private val dedupSubstringSql =
    s"""WITH $dupSpansCtes
      |SELECT doc_id, span_start, span_end, span_tokens FROM spans
      |ORDER BY doc_id, span_start""".stripMargin

  // ---- dedup_substring_scrub: cut the duplicated spans out ----------
  // The removal step Lee et al. actually apply: every token inside a
  // duplicated span is dropped (all occurrences — the C4 convention;
  // keep-first needs a global site ranking and buys ~nothing at
  // corpus scale), and the survivors reconstruct in position order to
  // a content fingerprint an auditor can verify without the corpus.
  // The mask join is doc_id-equi with a per-doc range predicate over
  // the handful of merged spans; everything else is the map-only
  // token explode and one per-doc aggregation.
  private def dedupSubstringScrub(spark: SparkSession, dir: String): DataFrame = {
    val spans = dupSpanFrame(spark, dir)
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), toks.as("t"))
      .withColumn("n_toks", size(col("t")).cast("long"))
    val tokens = docs
      .select(col("doc_id"), posexplode(col("t")).as(Seq("pos", "tok")))
      .select(col("doc_id"), col("pos").cast("long").as("pos"), col("tok"))
    val kept = tokens.as("tk").join(spans.as("sp"),
        col("tk.doc_id") === col("sp.doc_id") &&
          col("tk.pos").between(col("sp.span_start"), col("sp.span_end")),
        "left_anti")
    val recon = kept.groupBy("doc_id")
      .agg(count(lit(1)).as("n_kept"),
        md5(array_join(transform(
          array_sort(collect_list(struct(col("pos"), col("tok")))),
          e => e.getField("tok")), " ")).as("kept_fp"))
    docs.select("doc_id", "n_toks")
      .join(recon, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_toks"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        (col("n_toks") - coalesce(col("n_kept"), lit(0L))).as("n_removed"),
        col("kept_fp"))
      .orderBy("doc_id")
  }

  private val dedupSubstringScrubSql =
    s"""WITH $dupSpansCtes,
      |toks AS (
      |  SELECT doc_id, CAST(i - 1 AS BIGINT) AS pos, t[i] AS tok
      |  FROM t, range(1, 100000) r(i) WHERE i <= len(t)),
      |kept AS (
      |  SELECT tk.doc_id, tk.pos, tk.tok
      |  FROM toks tk LEFT JOIN spans sp
      |    ON sp.doc_id = tk.doc_id
      |    AND tk.pos BETWEEN sp.span_start AND sp.span_end
      |  WHERE sp.doc_id IS NULL),
      |recon AS (
      |  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_kept,
      |    md5(string_agg(tok, ' ' ORDER BY pos)) AS kept_fp
      |  FROM kept GROUP BY doc_id)
      |SELECT d.doc_id, CAST(len(d.t) AS BIGINT) AS n_toks,
      |  COALESCE(r.n_kept, 0) AS n_kept,
      |  CAST(len(d.t) AS BIGINT) - COALESCE(r.n_kept, 0) AS n_removed,
      |  r.kept_fp
      |FROM t d LEFT JOIN recon r USING (doc_id)
      |ORDER BY doc_id""".stripMargin

  // ---- dedup_edit: edit-distance near-identical pairs ---------------
  // The character-level complement of the token-set ops: pairs whose
  // levenshtein distance is ≤ 30% of the longer text (catches small
  // in-place edits that shuffle no 3-grams... and rejects pairs mere
  // topic overlap lets through the loose shingle floor). Blocking
  // keeps it 100 TB-shaped: candidates come from the SAME blocked
  // co-occurrence join at a loose jaccard floor (0.05) — never
  // all-pairs — and the O(len²) levenshtein kernel runs only on
  // survivors. The bound is integer-exact (dist·10 ≤ 3·maxlen), and
  // levenshtein is the classic DP — identical values both engines.
  private val editCandTau = 0.05

  private def dedupEdit(spark: SparkSession, dir: String): DataFrame = {
    val cand = jaccardPairsAt(spark, dir, editCandTau).select("a_id", "b_id")
    val d = Tables.documents(spark, dir).select(col("doc_id"), col("text"))
    cand
      .join(d.select(col("doc_id").as("a_id"), col("text").as("ta")), Seq("a_id"))
      .join(d.select(col("doc_id").as("b_id"), col("text").as("tb")), Seq("b_id"))
      .select(col("a_id"), col("b_id"),
        length(col("ta")).cast("long").as("la"),
        length(col("tb")).cast("long").as("lb"),
        levenshtein(col("ta"), col("tb")).cast("long").as("dist"))
      .filter(col("dist") * 10 <= greatest(col("la"), col("lb")) * 3)
      .orderBy("a_id", "b_id")
  }

  private val dedupEditSql =
    s"""WITH cand AS (
      |  SELECT a_id, b_id FROM (${jaccardPairsSqlAt(editCandTau.toString)}) j),
      |p AS (
      |  SELECT c.a_id, c.b_id,
      |    CAST(length(da.text) AS BIGINT) AS la,
      |    CAST(length(db.text) AS BIGINT) AS lb,
      |    CAST(levenshtein(da.text, db.text) AS BIGINT) AS dist
      |  FROM cand c
      |  JOIN documents da ON da.doc_id = c.a_id
      |  JOIN documents db ON db.doc_id = c.b_id)
      |SELECT a_id, b_id, la, lb, dist FROM p
      |WHERE dist * 10 <= GREATEST(la, lb) * 3
      |ORDER BY a_id, b_id""".stripMargin

  // ---- dedup_containment: asymmetric shingle containment ------------
  // Broder 1997's SECOND resemblance measure: containment
  // c(A,B) = |S(A)∩S(B)| / |S(A)|. Catches the pairs symmetric
  // jaccard structurally misses — a short doc quoted whole inside a
  // much longer one has c ≈ 1 but jaccard ≈ |A|/|B| ≈ 0, so it
  // passes every jaccard/minhash gate. Direction matters: a_id is
  // the CONTAINED (smaller-set) side.
  // Scale shape: the same shingle-hash co-occurrence join as
  // jaccard — |A∩B| is a count of narrow (hash, lang) matches and
  // non-overlapping pairs never materialize — but deliberately
  // WITHOUT the length-band block and size-ratio prune (containment
  // pairs live exactly in the large-size-gap region those bounds cut
  // away). Lang remains the block key; hot-shingle skew is AQE-split.
  // At 100 TB the candidate generator is MinHash: Broder's sketches
  // estimate containment as |minhash(A)∩minhash(B)|/|minhash(A)|
  // over the SAME signatures dedup_minhash already computes, so the
  // exact pass here runs only on sketch candidates.
  private val containTau = 0.9

  /** Directed containment pairs (a contained in b, unrounded ratio
    * ≥ containTau) — shared by dedup_containment and PipelineOps'
    * dedup-method report. */
  private[operators] def containmentPairs(spark: SparkSession, dir: String): DataFrame = {
    // reuses the SAME persisted frame as jaccardPairs (band is simply
    // not a join key here)
    val ex = explodedShingles(spark, dir)
    val a = ex.select(col("h"), col("lang"),
      col("doc_id").as("a_id"), col("n").as("na"))
    val b = ex.select(col("h"), col("lang"),
      col("doc_id").as("b_id"), col("n").as("nb"))
    a.join(b, Seq("h", "lang"))
      .filter(col("na") < col("nb") ||
        (col("na") === col("nb") && col("a_id") < col("b_id")))
      .groupBy("a_id", "b_id", "na", "nb")
      .agg(count(lit(1)).as("inter"))
      // unrounded filter, rounded projection (see jaccardPairs)
      .withColumn("containment", col("inter").cast("double") / col("na"))
      .filter(col("containment") >= containTau)
  }

  private def dedupContainment(spark: SparkSession, dir: String): DataFrame =
    containmentPairs(spark, dir)
      .select(col("a_id"), col("b_id"),
        col("na").cast("long").as("na"), col("nb").cast("long").as("nb"),
        round(col("containment"), 6).as("containment"))
      .orderBy("a_id", "b_id")

  /** DuckDB twin of [[containmentPairs]] rendered as a full query
    * (a_id, b_id, na, nb, rounded containment) — the report oracle
    * re-derives its unordered pair set from this. */
  private[operators] val dedupContainmentSql =
    s"""WITH sh AS (

      |  SELECT doc_id, lang, $shinglesSqlExpr AS s
      |  FROM (SELECT doc_id, lang, $toksSql AS t FROM documents) x
      |  WHERE len(t) >= 3)
      |SELECT a.doc_id AS a_id, b.doc_id AS b_id,
      |  CAST(len(a.s) AS BIGINT) AS na, CAST(len(b.s) AS BIGINT) AS nb,
      |  ROUND(CAST(len(list_intersect(a.s, b.s)) AS DOUBLE) / len(a.s), 6)
      |    AS containment
      |FROM sh a JOIN sh b
      |  ON a.lang = b.lang
      |  AND (len(a.s) < len(b.s)
      |       OR (len(a.s) = len(b.s) AND a.doc_id < b.doc_id))
      |WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE) / len(a.s)
      |    >= $containTau
      |ORDER BY a_id, b_id""".stripMargin

  // ---- dedup_semantic: SemDeDup within-cluster embedding dedup ------
  // SemDeDup (Abbas et al., "SemDeDup: Data-efficient learning at
  // web-scale through semantic deduplication", 2023): cluster the
  // corpus embeddings with k-means, then compare pairs ONLY inside
  // each cluster — semantic near-duplicates (paraphrases, templated
  // rewrites) land in the same cluster. Candidates come from the
  // TRAINED codebook (sim_kmeans' checkpointed assignment — the
  // hash-verified training loop) with dedup_embedding's 24-table
  // derived-width hyperplane LSH as the SECONDARY blocking key: the
  // pair join is
  // keyed on (cluster, tbl, key), never on bare cluster, so the
  // within-cluster pair fan-out stays near-linear even though the
  // codebook is a fixed kmK=8 (a bare-cluster self-join would be
  // Θ(n²/k) — quadratic in corpus size; at SemDeDup's own scale the
  // paper instead runs k ≈ √n ≈ 100k clusters, which this fixed-k
  // demonstration codebook does not). Survivors get the exact
  // decimal cosine. The dup DECISION follows the paper's band:
  // is_dup cuts at τ = 0.9 (SemDeDup operates at high cosine —
  // ~0.9+; this synthetic table's densest pairs sit at 0.40-0.51,
  // so is_dup is honestly rare here); pairs down to the 0.3
  // similarity floor are reported as the ranked within-cluster
  // semantic-similarity band a curation team reads to pin τ. The
  // LSH blocking makes that band a MEASURED-recall subset, exactly
  // like dedup_embedding's candidates: sign-LSH collision odds at
  // cosine 0.3-0.5 give ~0.67-0.85 per-pair recall (measured
  // 209/285 = 0.73 at sf0.001; invariant spec pins precision 1.0
  // and a 0.55 floor), while at the is_dup ≥ 0.9 decision band
  // per-table collision odds are ≥ 0.39 so 24 tables reach recall
  // ≈ 1 — the construction is near-exhaustive exactly where the
  // dup/keep decision is made. The keeper convention for is_dup
  // pairs is min vec_id, like dedup_exact.
  // Scale: bucket rows are narrow (vec_id, cluster, tbl, key) — the
  // vector never rides the candidate shuffle; a hot (cluster,
  // bucket) cell is exactly the skewed partition AQE splits.
  // Vectors are dec_quant'd once scan-side; the pair loop runs only
  // dec_dot's long multiplies. The oracle replays the FULL pipeline
  // — k-means training via the shared CTE chain, the hyperplane
  // keys via the shared planes→keys chain, then within-cluster
  // exact-decimal cosines — so the hash gate verifies codebook,
  // membership, blocking, and pair set end to end.
  private val semTau = 0.9 // SemDeDup dup-decision band
  private val semBand = 0.3 // reported similarity floor

  private def dedupSemantic(spark: SparkSession, dir: String): DataFrame = {
    val m = SimilarityOps.kmeansTrain(spark, dir, SimilarityOps.kmIters)
      .select(col("vec_id"), col("dq"), col("cluster"))
      .withColumn("norm",
        graft.functions.VectorMath.dotQ(col("dq"), col("dq")))
    // narrow blocking rows: cluster from the trained assignment,
    // (tbl, key) from the shared hyperplane LSH expression at the
    // corpus-derived width (conservative for the cluster block — the
    // true population is the largest cluster, but the total needs no
    // training pass and only over-widens, which exact verification
    // makes recall-only)
    val width = LshWidth.corpusPlanes(spark, dir)
    val keyed = Tables.embeddings(spark, dir)
      .select(col("vec_id"),
        posexplode(expr(s"hyperplane_buckets(embedding, $width)"))
          .as(Seq("tbl", "key")))
      .join(m.select(col("vec_id"), col("cluster")), Seq("vec_id"))
    val cand = keyed.as("x").join(keyed.as("y"),
        col("x.cluster") === col("y.cluster") &&
          col("x.tbl") === col("y.tbl") && col("x.key") === col("y.key") &&
          col("x.vec_id") < col("y.vec_id"))
      .select(col("x.cluster").as("cluster"), col("x.vec_id").as("a_id"),
        col("y.vec_id").as("b_id"))
      .distinct()
    cand
      .join(m.select(col("vec_id").as("a_id"), col("dq").as("adq"),
        col("norm").as("an")), Seq("a_id"))
      .join(m.select(col("vec_id").as("b_id"), col("dq").as("bdq"),
        col("norm").as("bn")), Seq("b_id"))
      .withColumn("cosine", graft.functions.VectorMath.cosineQ(
        col("adq"), col("bdq"), col("an"), col("bn")))
      .filter(col("cosine") >= semBand)
      .select(col("cluster"), col("a_id"), col("b_id"),
        round(col("cosine"), 6).as("cosine"),
        (col("cosine") >= semTau).cast("int").as("is_dup"))
      .orderBy("cluster", "a_id", "b_id")
  }

  private val dedupSemanticSql: String = {
    val fin = s"assign${SimilarityOps.kmIters}"
    s"""WITH ${SimilarityOps.kmCtes},
      |${hyperKeysCtes(LshWidth.corpusCountSql)},
      |norms AS (
      |  SELECT vec_id, CAST(SUM(d * d) AS DOUBLE) AS norm
      |  FROM terms GROUP BY vec_id),
      |blocked AS (
      |  SELECT k.vec_id, a.cluster, k.t, k.key
      |  FROM keys k JOIN $fin a USING (vec_id)),
      |cand AS (
      |  SELECT DISTINCT x.cluster, x.vec_id AS a_id, y.vec_id AS b_id
      |  FROM blocked x JOIN blocked y
      |    ON x.cluster = y.cluster AND x.t = y.t AND x.key = y.key
      |    AND x.vec_id < y.vec_id),
      |dots AS (
      |  SELECT c.cluster, c.a_id, c.b_id,
      |    CAST(SUM(ta.d * tb.d) AS DOUBLE) AS dot
      |  FROM cand c
      |  JOIN terms ta ON ta.vec_id = c.a_id
      |  JOIN terms tb ON tb.vec_id = c.b_id AND tb.i = ta.i
      |  GROUP BY 1, 2, 3)
      |SELECT cluster, a_id, b_id, ROUND(cosine, 6) AS cosine,
      |  CAST(cosine >= $semTau AS INT) AS is_dup
      |FROM (
      |  SELECT d.cluster, d.a_id, d.b_id,
      |    d.dot / (sqrt(na.norm) * sqrt(nb.norm)) AS cosine
      |  FROM dots d
      |  JOIN norms na ON d.a_id = na.vec_id
      |  JOIN norms nb ON d.b_id = nb.vec_id) t
      |WHERE cosine >= $semBand
      |ORDER BY cluster, a_id, b_id""".stripMargin
  }

  override val ops: Seq[Op] = Seq(
    Op("dedup_exact", dedupExact, Some(dedupExactSql)),
    Op("dedup_ngram_jaccard", dedupNgramJaccard, Some(dedupNgramJaccardSql)),
    Op("dedup_minhash", dedupMinhash, Some(dedupMinhashSql)),
    Op("dedup_minhash_recall", dedupMinhashRecall, Some(dedupMinhashRecallSql)),
    Op("dedup_simhash", dedupSimhash, Some(dedupSimhashSql)),
    Op("dedup_embedding", dedupEmbedding, Some(dedupEmbeddingSql)),
    Op("dedup_embedding_sweep", dedupEmbeddingSweep,
      Some(dedupEmbeddingSweepSql)),
    Op("dedup_edit", dedupEdit, Some(dedupEditSql)),
    Op("dedup_containment", dedupContainment, Some(dedupContainmentSql)),
    Op("dedup_substring", dedupSubstring, Some(dedupSubstringSql)),
    Op("dedup_substring_scrub", dedupSubstringScrub,
      Some(dedupSubstringScrubSql)),
    Op("dedup_semantic", dedupSemantic, Some(dedupSemanticSql)),
  )
}
