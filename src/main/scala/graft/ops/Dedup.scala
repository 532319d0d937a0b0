package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.models.LangId

/** Deduplication operators for training-data pipelines (north-rule
  * additions; the reference's only dedup shape is DISTINCT on ids, J7 —
  * /root/reference/backendClasses/DQTestToolHelper.py:213).
  *
  * Scale shape shared by every operator here:
  *   1. band each doc into SHORT keys (id + one 64-bit key per band — the
  *      shingle/signature payload never enters the banding shuffle);
  *   2. self equi-join the slim banded frame → distinct candidate
  *      (id1, id2) pairs;
  *   3. verify candidates with exact Jaccard by joining the shingle
  *      arrays back on id (shuffles the text payload ONCE per side,
  *      proportional to the corpus, never to bands × corpus).
  * Round-1 carried the full shingle array through all 16 band keys and
  * both join sides (≈32× corpus text through the shuffle, measured
  * 1,023 docs/sec); the slim shape is the same algorithm at ~2× corpus
  * shuffle volume.
  */
object Dedup {

  /** Exact dedup: keep the smallest id per identical key. */
  def exactKeepFirst(df: DataFrame, keyCol: String, idCol: String): DataFrame =
    df.groupBy(col(keyCol))
      .agg(min(col(idCol)).as(idCol), count(lit(1)).as("dup_count"))

  /** Word k-shingles of a text column (array<string>); empty array when
    * the text has fewer than k tokens (sequence(1,0) would descend). */
  def shingles(text: Column, k: Int): Column = {
    val toks = split(trim(lower(text)), "\\s+")
    when(size(toks) >= k,
      transform(
        sequence(lit(1), size(toks) - lit(k - 1)),
        i => array_join(slice(toks, i, lit(k)), " ")))
      .otherwise(array().cast("array<string>"))
  }

  /** MinHash signature from PRE-HASHED shingles (array<long> of one
    * xxhash64 per shingle): the i-th family member re-hashes each 64-bit
    * value xor'd with a per-seed mask. Materialize the base hashes as
    * their own column first — Catalyst does NOT hoist loop-invariant
    * subexpressions out of lambda bodies, so inlining `transform(sh,
    * xxhash64)` here would recompute the string hash numHashes times
    * per shingle. */
  def minhashSignatureFromHashes(hashCol: Column, numHashes: Int): Column =
    transform(
      sequence(lit(0), lit(numHashes - 1)),
      i => {
        val iL = i.cast("long")
        val mask = shiftleft(iL, 40).bitwiseXOR(shiftleft(iL, 20)).bitwiseXOR(iL)
        array_min(transform(hashCol, h => xxhash64(h.bitwiseXOR(mask))))
      })

  /** Convenience single-expression signature (tests / ad-hoc use). For
    * the hot path prefer a separate base-hash column +
    * [[minhashSignatureFromHashes]] (see that doc). */
  def minhashSignature(shingleCol: Column, numHashes: Int): Column =
    minhashSignatureFromHashes(transform(shingleCol, s => xxhash64(s)), numHashes)

  /** Exact Jaccard over two shingle-array columns. */
  def jaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(array_distinct(a), array_distinct(b)))
    val uni = size(array_union(a, b))
    when(uni > 0, inter.cast("double") / uni.cast("double")).otherwise(lit(0.0))
  }

  /** Verify slim candidate pairs (id1, id2) with exact Jaccard by joining
    * the shingle arrays back on id — the payload moves through exactly
    * one hash-join shuffle per side. */
  private def verifyJaccard(
      cands: DataFrame, // (id1, id2), distinct
      docSh: DataFrame, // (id, sh)
      threshold: Double): DataFrame = {
    val a = docSh.select(col("id").as("id1"), col("sh").as("__sh1"))
    val b = docSh.select(col("id").as("id2"), col("sh").as("__sh2"))
    cands.join(a, Seq("id1")).join(b, Seq("id2"))
      .select(col("id1"), col("id2"),
        jaccard(col("__sh1"), col("__sh2")).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** MinHash + LSH near-duplicate pairs:
    * shingle → signature → per-band 64-bit keys → slim self equi-join →
    * exact-Jaccard verify ≥ threshold. Returns (id1, id2, jaccard),
    * id1 < id2, distinct.
    *
    * bands·rowsPerBand = numHashes; the (bands, rowsPerBand) choice sets
    * the S-curve: P(candidate) = 1 − (1 − j^r)^b. Defaults target
    * j ≥ 0.8. */
  def minhashPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      shingleK: Int = 3,
      numHashes: Int = 64,
      bands: Int = 16,
      jaccardThreshold: Double = 0.8): DataFrame = {
    val r = numHashes / bands
    val withSh = df
      .select(col(idCol).as("id"), shingles(col(textCol), shingleK).as("sh"))
      .filter(size(col("sh")) > 0)
    val withSig = withSh
      .withColumn("__hs", transform(col("sh"), s => xxhash64(s)))
      .withColumn("sig", minhashSignatureFromHashes(col("__hs"), numHashes))
    // one 64-bit key per band: xxhash64 of (band index, signature slice) —
    // hash collisions can only merge buckets (extra candidates, verified
    // away below), never lose one.
    val banded = withSig.select(
      col("id"),
      explode(transform(
        sequence(lit(0), lit(bands - 1)),
        b => xxhash64(b, slice(col("sig"), b.cast("int") * lit(r) + lit(1), lit(r)))))
        .as("key"))
    val l = banded.alias("l")
    val rt = banded.alias("r")
    val cands = l.join(rt,
        col("l.key") === col("r.key") && col("l.id") < col("r.id"))
      .select(col("l.id").as("id1"), col("r.id").as("id2"))
      .distinct()
    verifyJaccard(cands, withSh, jaccardThreshold)
  }

  /** 64-bit SimHash of a text (driver/executor-side scalar). Token
    * hashes via splitmix64; bit b of the result = sign of the weighted
    * bit-b vote. */
  def simhash64(text: String): Long = {
    val toks = LangId.normalize(text).split("\\s+")
    val acc = new Array[Int](64)
    toks.foreach { t =>
      if (t.nonEmpty) {
        var h = 1125899906842597L
        var i = 0
        while (i < t.length) { h = 31L * h + t.charAt(i); i += 1 }
        h = graft.synth.ImageGen.splitmix64(h)
        var b = 0
        while (b < 64) { acc(b) += (if (((h >>> b) & 1L) == 1L) 1 else -1); b += 1 }
      }
    }
    var out = 0L
    var b = 0
    while (b < 64) { if (acc(b) > 0) out |= (1L << b); b += 1 }
    out
  }

  /** SimHash near-duplicate pairs: compute the 64-bit fingerprint, then
    * reuse the guaranteed-recall block-pair banding from
    * [[graft.discovery.PhashDup]] (same Hamming-join shape). */
  def simhashPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      maxHamming: Int = 3): DataFrame = {
    val sim = udf((s: String) => simhash64(s))
    val fp = df.select(col(idCol).as("image_id"), sim(col(textCol)).as("phash"))
    graft.discovery.PhashDup.duplicatePairs(fp, maxHamming = maxHamming)
      .withColumnRenamed("id1", "id1").withColumnRenamed("id2", "id2")
  }

  /** N-gram Jaccard pair verification over banding candidates — the
    * exact-similarity variant (no signature approximation). Candidates
    * come from sharing a RARE shingle, and rarity is enforced: one
    * document-frequency pass drops shingles with df < 2 (can't form a
    * pair) or df > maxDf (hot keys like "a photo of" would otherwise
    * produce O(df²) candidates per shingle — the round-1 defect). A true
    * near-dup pair shares ~all its shingles, so it survives unless every
    * single shared shingle is corpus-hot — the standard rare-shingle
    * banding trade (cf. suffix-array / exact-hash dedup literature). */
  def ngramJaccardPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      shingleK: Int = 3,
      jaccardThreshold: Double = 0.8,
      maxShinglesPerDoc: Int = 32,
      maxDf: Int = 256): DataFrame = {
    val withSh = df
      .select(col(idCol).as("id"), shingles(col(textCol), shingleK).as("sh"))
      .filter(size(col("sh")) > 0)
    // band on a bounded sample of each doc's shingles (first K, hashed to
    // a 64-bit key) — keeps the explode linear in corpus size
    val banded = withSh
      .select(col("id"),
        explode(array_distinct(transform(
          slice(col("sh"), 1, maxShinglesPerDoc), s => xxhash64(s)))).as("key"))
    val keyDf = banded.groupBy("key")
      .agg(count(lit(1)).as("df"))
      .filter(col("df") >= 2 && col("df") <= maxDf)
      .select("key")
    val rare = banded.join(keyDf, Seq("key"), "left_semi")
    val l = rare.alias("l")
    val r = rare.alias("r")
    val cands = l.join(r, col("l.key") === col("r.key") && col("l.id") < col("r.id"))
      .select(col("l.id").as("id1"), col("r.id").as("id2"))
      .distinct()
    verifyJaccard(cands, withSh, jaccardThreshold)
  }
}
