package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.models.LangId

/** Deduplication operators for training-data pipelines (north-rule
  * additions; the reference's only dedup shape is DISTINCT on ids, J7 —
  * /root/reference/backendClasses/DQTestToolHelper.py:213).
  *
  * All candidate generation is banding + equi-join (shuffle on short
  * keys), verification is built-in array expressions — the pattern that
  * survives 10^12 rows. MinHash signatures are computed UDF-free with
  * nested higher-order functions (codegen'd).
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

  /** MinHash signature. One *string* xxhash64 per shingle, then the
    * i-th family member re-hashes that 64-bit value xor'd with a
    * per-seed mask (fixed-width long hashing — far cheaper than hashing
    * the string per seed; xor/shift only, safe under ANSI overflow
    * checking). Pure built-ins — no UDF. */
  def minhashSignature(shingleCol: Column, numHashes: Int): Column = {
    val hs = transform(shingleCol, s => xxhash64(s))
    transform(
      sequence(lit(0), lit(numHashes - 1)),
      i => {
        val iL = i.cast("long")
        val mask = shiftleft(iL, 40).bitwiseXOR(shiftleft(iL, 20)).bitwiseXOR(iL)
        array_min(transform(hs, h => xxhash64(h.bitwiseXOR(mask))))
      })
  }

  /** Exact Jaccard over two shingle-array columns. */
  def jaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(array_distinct(a), array_distinct(b)))
    val uni = size(array_union(a, b))
    when(uni > 0, inter.cast("double") / uni.cast("double")).otherwise(lit(0.0))
  }

  /** MinHash + LSH near-duplicate pairs:
    * shingle → signature → band keys → self equi-join per band →
    * verified Jaccard ≥ threshold. Returns (id1, id2, jaccard), id1<id2.
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
    val withSig = df
      .select(col(idCol).as("id"), shingles(col(textCol), shingleK).as("sh"))
      .filter(size(col("sh")) > 0)
      .withColumn("sig", minhashSignature(col("sh"), numHashes))
    val banded = withSig.select(
      col("id"), col("sh"),
      explode(transform(
        sequence(lit(0), lit(bands - 1)),
        b => struct(b.as("band"),
          xxhash64(array_join(
            transform(slice(col("sig"), b * r + 1, lit(r)), x => x.cast("string")),
            ",")).as("key")))).as("bk"))
      .select(col("id"), col("sh"), col("bk.band").as("band"), col("bk.key").as("key"))
    val l = banded.alias("l")
    val rt = banded.alias("r")
    l.join(rt,
        col("l.band") === col("r.band") && col("l.key") === col("r.key") &&
          col("l.id") < col("r.id"))
      .select(col("l.id").as("id1"), col("r.id").as("id2"),
        jaccard(col("l.sh"), col("r.sh")).as("jaccard"))
      .filter(col("jaccard") >= jaccardThreshold)
      .groupBy("id1", "id2").agg(max("jaccard").as("jaccard"))
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
    * exact-similarity variant (no signature approximation): candidates
    * come from sharing a rare shingle, verified with true Jaccard. */
  def ngramJaccardPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      shingleK: Int = 3,
      jaccardThreshold: Double = 0.8,
      maxShinglesPerDoc: Int = 32): DataFrame = {
    val withSh = df
      .select(col(idCol).as("id"), shingles(col(textCol), shingleK).as("sh"))
      .filter(size(col("sh")) > 0)
    // band on a bounded sample of each doc's shingles (first K) — keeps
    // the explode linear in corpus size
    val banded = withSh
      .select(col("id"), col("sh"),
        explode(slice(col("sh"), 1, maxShinglesPerDoc)).as("shingle"))
    val l = banded.alias("l")
    val r = banded.alias("r")
    l.join(r, col("l.shingle") === col("r.shingle") && col("l.id") < col("r.id"))
      .select(col("l.id").as("id1"), col("r.id").as("id2"),
        jaccard(col("l.sh"), col("r.sh")).as("jaccard"))
      .filter(col("jaccard") >= jaccardThreshold)
      .groupBy("id1", "id2").agg(max("jaccard").as("jaccard"))
  }
}
