package graft.models

import org.apache.spark.sql.{Dataset, SparkSession}

/** KenLM-style character n-gram language model with Stupid Backoff
  * (tri → bi → uni → floor), used as the perplexity scorer. The count
  * tables are fit with one distributed `flatMap → groupBy → count` pass
  * over the *whole* corpus — the Spark translation of the reference
  * training its anomaly model on the full table
  * (/root/reference/backendClasses/DQTestToolHelper.py:130) — then
  * collected (bounded: |charset|^3 keys) and broadcast.
  */
final case class NGramLMModel(
    counts: Map[Long, Long], // kind-tagged n-gram key -> count
    total: Long) { // total unigram mass

  import NGramLMModel._

  def logProb(text: String): Double = {
    val s = LangId.normalize(text)
    if (s.length < 3) return math.log(floorProb)
    var lp = 0.0
    var i = 2
    while (i < s.length) {
      val c1 = s.charAt(i - 2); val c2 = s.charAt(i - 1); val c3 = s.charAt(i)
      val t = counts.getOrElse(triKey(c1, c2, c3), 0L)
      val p =
        if (t > 0L) t.toDouble / counts(biKey(c1, c2)).toDouble
        else {
          val b = counts.getOrElse(biKey(c2, c3), 0L)
          if (b > 0L) backoff * b.toDouble / counts(uniKey(c2)).toDouble
          else {
            val u = counts.getOrElse(uniKey(c3), 0L)
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
}

object NGramLM {
  /** Distributed fit: map-side combine via groupBy(key).count, then a
    * bounded collect (≤ |charset|³ entries). Scale-safe at 10^12 rows —
    * the shuffle carries at most the key-space cardinality per partition. */
  def fit(spark: SparkSession, captions: Dataset[String]): NGramLMModel = {
    import spark.implicits._
    val counted = captions
      .flatMap(NGramLMModel.emit _)
      .groupBy("value").count()
      .as[(Long, Long)]
      .collect()
    val counts = counted.toMap
    val total = counted.iterator
      .filter { case (k, _) => (k >>> 32) == 1L }
      .map(_._2).sum
    NGramLMModel(counts, math.max(1L, total))
  }
}
