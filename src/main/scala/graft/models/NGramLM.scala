package graft.models

import org.apache.spark.sql.{Dataset, SparkSession}

/** KenLM-style character n-gram language model with Stupid Backoff
  * (tri → bi → uni → floor), used as the perplexity scorer. The count
  * tables are fit with one distributed `flatMap → groupBy → count` pass
  * over the *whole* corpus — the Spark translation of the reference
  * training its anomaly model on the full table
  * (/root/reference/backendClasses/DQTestToolHelper.py:130) — then
  * collected (bounded: |charset|^3 keys) and broadcast.
  *
  * Counts live in parallel sorted arrays with binary-search lookup: no
  * per-lookup boxing in the per-row scoring path, compact serialization
  * for the broadcast.
  */
final class NGramLMModel(
    private val keys: Array[Long], // sorted kind-tagged n-gram keys
    private val vals: Array[Long],
    val total: Long) extends Serializable {

  import NGramLMModel._

  def count(key: Long): Long = {
    val i = java.util.Arrays.binarySearch(keys, key)
    if (i >= 0) vals(i) else 0L
  }

  def size: Int = keys.length

  def logProb(text: String): Double = {
    val s = LangId.normalize(text)
    if (s.length < 3) return math.log(floorProb)
    var lp = 0.0
    var i = 2
    while (i < s.length) {
      val c1 = s.charAt(i - 2); val c2 = s.charAt(i - 1); val c3 = s.charAt(i)
      val t = count(triKey(c1, c2, c3))
      val p =
        if (t > 0L) t.toDouble / count(biKey(c1, c2)).toDouble
        else {
          val b = count(biKey(c2, c3))
          if (b > 0L) backoff * b.toDouble / count(uniKey(c2)).toDouble
          else {
            val u = count(uniKey(c3))
            if (u > 0L) backoff * backoff * u.toDouble / total.toDouble
            else floorProb
          }
        }
      lp += math.log(p)
      i += 1
    }
    lp
  }

  /** Per-character perplexity (length-normalized). */
  def perplexity(text: String): Double = {
    val s = LangId.normalize(text)
    val n = math.max(1, s.length - 2)
    math.exp(-logProb(text) / n)
  }
}

object NGramLMModel {
  val backoff = 0.4
  val floorProb = 1e-7

  def apply(counts: Map[Long, Long], total: Long): NGramLMModel =
    fromPairs(counts.toArray, total)

  def fromPairs(pairs: Array[(Long, Long)], total: Long): NGramLMModel = {
    val sorted = pairs.sortBy(_._1)
    new NGramLMModel(sorted.map(_._1), sorted.map(_._2), math.max(1L, total))
  }

  // 7-bit char packing with a kind tag in the top bits.
  @inline def uniKey(c: Char): Long = (1L << 32) | (c & 0x7f)
  @inline def biKey(c1: Char, c2: Char): Long =
    (2L << 32) | ((c1 & 0x7f) << 7) | (c2 & 0x7f)
  @inline def triKey(c1: Char, c2: Char, c3: Char): Long =
    (3L << 32) | ((c1 & 0x7f).toLong << 14) | ((c2 & 0x7f) << 7) | (c3 & 0x7f)

  /** All (key, 1) emissions for one text — shared by fit and tests. */
  def emit(text: String): Iterator[Long] = {
    val s = LangId.normalize(text)
    val out = new scala.collection.mutable.ArrayBuffer[Long](s.length * 3)
    var i = 0
    while (i < s.length) {
      out += uniKey(s.charAt(i))
      if (i >= 1) out += biKey(s.charAt(i - 1), s.charAt(i))
      if (i >= 2) out += triKey(s.charAt(i - 2), s.charAt(i - 1), s.charAt(i))
      i += 1
    }
    out.iterator
  }

  /** Accumulate one text's n-gram counts into a partition-local map —
    * the zero-allocation path used by the distributed fit. */
  def emitInto(text: String, m: java.util.HashMap[Long, Long]): Unit = {
    val s = LangId.normalize(text)
    var i = 0
    while (i < s.length) {
      m.merge(uniKey(s.charAt(i)), 1L, java.lang.Long.sum _)
      if (i >= 1) m.merge(biKey(s.charAt(i - 1), s.charAt(i)), 1L, java.lang.Long.sum _)
      if (i >= 2)
        m.merge(triKey(s.charAt(i - 2), s.charAt(i - 1), s.charAt(i)), 1L,
          java.lang.Long.sum _)
      i += 1
    }
  }
}

object NGramLM {
  /** Distributed fit. The naive shape (flatMap one row per n-gram →
    * groupBy → count) pays Dataset-encoder cost per emitted element —
    * ~450 elements/caption — so the fit instead pre-aggregates each
    * partition into a plain JVM hash map (bounded by the key-space
    * cardinality ≤ |charset|³, NOT by partition row count) and ships
    * only (key, count) pairs into the shuffle. Scale-safe at 10^12
    * rows and ~100× fewer encoded rows. */
  def fit(spark: SparkSession, captions: Dataset[String]): NGramLMModel = {
    import spark.implicits._
    val counted = captions
      .mapPartitions { it =>
        val m = new java.util.HashMap[Long, Long](1 << 14)
        it.foreach(NGramLMModel.emitInto(_, m))
        val out = new Array[(Long, Long)](m.size)
        val e = m.entrySet().iterator()
        var i = 0
        while (e.hasNext) { val kv = e.next(); out(i) = (kv.getKey, kv.getValue); i += 1 }
        out.iterator
      }
      .groupBy("_1").agg(org.apache.spark.sql.functions.sum("_2"))
      .as[(Long, Long)]
      .collect()
    val total = counted.iterator
      .filter { case (k, _) => (k >>> 32) == 1L }
      .map(_._2).sum
    NGramLMModel.fromPairs(counted, total)
  }
}
