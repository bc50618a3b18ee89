package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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
  private val shinglesSqlExpr =
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
  private def hashedShingles(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
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
  private def dedupNgramJaccard(spark: SparkSession, dir: String): DataFrame = {
    // both join sides read this; persist so the interpreted shingle
    // construction (tokenize→3-gram→hash, the expensive part) runs
    // once (CacheManager dedupes identical plans across calls).
    val ex = hashedShingles(spark, dir)
      .select(col("doc_id"), col("lang"), col("band"),
        size(col("s")).as("n"), explode(col("s")).as("h"))
      .persist()
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
      .filter(col("jaccard") >= 0.5)
      .select(col("a_id"), col("b_id"), round(col("jaccard"), 6).as("jaccard"))
      .orderBy("a_id", "b_id")
  }

  private val dedupNgramJaccardSql =
    s"""WITH d AS (
      |  SELECT doc_id, lang, CAST(len(t) // 50 AS BIGINT) AS band,
      |    $shinglesSqlExpr AS s
      |  FROM (SELECT doc_id, lang, $toksSql AS t FROM documents) x)
      |SELECT a.doc_id AS a_id, b.doc_id AS b_id,
      |  ROUND(CAST(len(list_intersect(a.s, b.s)) AS DOUBLE) /
      |    len(list_distinct(list_concat(a.s, b.s))), 6) AS jaccard
      |FROM d a JOIN d b
      |  ON a.lang = b.lang AND a.band = b.band AND a.doc_id < b.doc_id
      |WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE) /
      |    len(list_distinct(list_concat(a.s, b.s))) >= 0.5
      |ORDER BY a_id, b_id""".stripMargin

  // ---- dedup_minhash: MinHash(128) + 32-band LSH --------------------
  // sig[k] = min over shingles of xxhash64(k, shingle); band j =
  // xxhash64(j, sig[4j..4j+3]). The signature comes from the native
  // minhash128 Expression (graft.functions.MinHash128, registered by
  // GraftExtensions): all 128 rows in one codegen'd pass per doc —
  // no explode, no 128-buffer aggregation, no shuffle. Candidates =
  // pairs sharing any (band, band_hash) bucket; exact jaccard
  // verifies candidates only. No oracle (hash-function specific) —
  // rows-only check; deterministic output.
  private def dedupMinhash(spark: SparkSession, dir: String): DataFrame = {
    // The shingle stage feeds both bucket-join sides AND the verify
    // joins; persist it once (Spark's CacheManager dedupes identical
    // plans, so repeated calls share one entry). ~2 KB/doc — at
    // 100 TB this stage would be an explicit checkpoint table.
    val d = hashedShingles(spark, dir)
      .select(col("doc_id"), col("s"))
      .filter(size(col("s")) > 0)
      .persist()
    val sigs = d.select(col("doc_id"), expr("minhash128(s)").as("sig"))
    val bandCols = (0 until 32).map(j =>
      xxhash64(lit(j), element_at(col("sig"), 4 * j + 1),
        element_at(col("sig"), 4 * j + 2), element_at(col("sig"), 4 * j + 3),
        element_at(col("sig"), 4 * j + 4)))
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
      .orderBy("a_id", "b_id")
  }

  // ---- dedup_simhash: 64-bit simhash + hamming ≤ 3 ------------------
  // Signature via the native codegen'd simhash64 Expression
  // (graft.functions.SimHash64, registered by GraftExtensions): one
  // map-only pass per document — no explode, no aggregation shuffle.
  // Candidates via the 4×16-bit chunk pigeonhole: hamming(a,b) ≤ 3
  // forces at least one equal chunk.
  private def dedupSimhash(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir)
      .select(col("doc_id"), toks.as("t"))
      .filter(size(col("t")) > 0)
      .select(col("doc_id"), expr("simhash64(t)").as("sh"))
    val chunks = d.select(col("doc_id"), col("sh"),
        posexplode(expr(
          "transform(sequence(0, 3), c -> shiftright(sh, c * 16) & 65535L)"))
          .as(Seq("c", "chunk")))
    chunks.as("x").join(chunks.as("y"),
        col("x.c") === col("y.c") && col("x.chunk") === col("y.chunk") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a_id"), col("y.doc_id").as("b_id"),
        bit_count(col("x.sh").bitwiseXOR(col("y.sh"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= 3)
      .orderBy("a_id", "b_id")
  }

  // ---- dedup_embedding: label-blocked cosine near-dup pairs ---------
  // Per-element decimal products summed exactly (order-independent ⇒
  // cross-engine identical), double only for the final sqrt/divide —
  // single IEEE ops, deterministic. Norms precomputed per vector
  // before the pairwise join. τ = 0.4.
  import graft.functions.VectorMath.dotDec

  // Two-phase: a codegen'd columnar double dot product (64 flat
  // columns, whole-stage fused multiply-adds) prefilters the
  // quadratic pair set at τ−1e-6 (double vs decimal cosine differ by
  // ≪1e-9, so no survivor is lost); the exact decimal cosine then
  // runs only on the few candidates, giving oracle-identical output
  // without paying interpreted-decimal cost on every pair.
  private def dedupEmbedding(spark: SparkSession, dir: String): DataFrame = {
    val dims = 0 until 64
    val e = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("label"), col("embedding").as("v"))
      .withColumn("norm", dotDec(col("v"), col("v")))
    // pair-join sides carry only the flat doubles (the float array
    // would double the shuffled bytes); survivors re-join the arrays
    // below — a few hundred rows against a broadcastable side.
    def side(p: String) = e.select(
      Seq(col("vec_id").as(s"${p}_id"), col("label"),
        col("norm").as(s"${p}n")) ++
        dims.map(i => element_at(col("v"), i + 1).cast("double").as(s"$p$i")): _*)
    val approxDot = dims.map(i => col(s"a$i") * col(s"b$i")).reduce(_ + _)
    val cand = side("a").join(side("b"), Seq("label"))
      .filter(col("a_id") < col("b_id"))
      .filter(approxDot / (sqrt(col("an")) * sqrt(col("bn"))) >= 0.4 - 1e-6)
      .select("a_id", "b_id", "an", "bn")
    // no broadcast hint: cand is the tiny side, and AQE's size
    // estimates pick the right build side at any scale (hinting the
    // full embeddings table would be a driver OOM at 100 TB)
    val vecs = e.select(col("vec_id"), col("v"))
    cand
      .join(vecs.select(col("vec_id").as("a_id"), col("v").as("av")),
        Seq("a_id"))
      .join(vecs.select(col("vec_id").as("b_id"), col("v").as("bv")),
        Seq("b_id"))
      .withColumn("cosine",
        dotDec(col("av"), col("bv")) / (sqrt(col("an")) * sqrt(col("bn"))))
      .filter(col("cosine") >= 0.4)
      .select(col("a_id"), col("b_id"), round(col("cosine"), 6).as("cosine"))
      .orderBy("a_id", "b_id")
  }

  private val dedupEmbeddingSql =
    """WITH terms AS (
      |  SELECT vec_id, label, i,
      |    CAST(CAST(embedding[i] AS DOUBLE) AS DECIMAL(12,8)) AS d
      |  FROM embeddings, range(1, 65) r(i)),
      |norms AS (
      |  SELECT vec_id, label, CAST(SUM(d * d) AS DOUBLE) AS norm
      |  FROM terms GROUP BY vec_id, label),
      |dots AS (
      |  SELECT a.vec_id AS a_id, b.vec_id AS b_id,
      |    CAST(SUM(a.d * b.d) AS DOUBLE) AS dot
      |  FROM terms a JOIN terms b
      |    ON a.label = b.label AND a.i = b.i AND a.vec_id < b.vec_id
      |  GROUP BY a.vec_id, b.vec_id)
      |SELECT a_id, b_id, ROUND(cosine, 6) AS cosine FROM (
      |  SELECT d.a_id, d.b_id,
      |    d.dot / (sqrt(na.norm) * sqrt(nb.norm)) AS cosine
      |  FROM dots d
      |  JOIN norms na ON d.a_id = na.vec_id
      |  JOIN norms nb ON d.b_id = nb.vec_id) t
      |WHERE cosine >= 0.4
      |ORDER BY a_id, b_id""".stripMargin

  override val ops: Seq[Op] = Seq(
    Op("dedup_exact", dedupExact, Some(dedupExactSql)),
    Op("dedup_ngram_jaccard", dedupNgramJaccard, Some(dedupNgramJaccardSql)),
    Op("dedup_minhash", dedupMinhash, None),
    Op("dedup_simhash", dedupSimhash, None),
    Op("dedup_embedding", dedupEmbedding, Some(dedupEmbeddingSql)),
  )
}
