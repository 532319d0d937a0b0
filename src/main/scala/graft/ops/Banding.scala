package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Shared LSH-banding candidate generation: distinct (id1, id2) pairs of
  * ids sharing a 64-bit band key, produced with ONE shuffle.
  *
  * Shape: repartition the slim (id, key) frame by key, sort within
  * partitions by (key, id), and stream each partition pairing
  * consecutive same-key runs in plain Scala — the same pattern as
  * [[graft.discovery.PhashDup.duplicatePairs]] (a self equi-join would
  * exchange the frame twice; collect_list object-agg falls back to its
  * slow sort-based path at >128 keys per partition).
  *
  * Degenerate keys (a band key shared by a mass-duplicate cluster — the
  * web-scale n² landmine) are CAPPED, with a deliberately different
  * policy per scan shape:
  *  - [[candidatePairs]] (slim candidates feeding a verify JOIN) pairs
  *    only its first `maxBucket` members per run (deterministic:
  *    smallest ids) and overflow rows get NO candidates from that key —
  *    candidate VOLUME is this shape's cost, and the strict cap bounds
  *    per-key work at maxBucket²/2 no matter how hot the key.
  *  - [[cosinePairs]] (verify fused into the scan, only TRUE pairs
  *    leave) additionally scores every overflow row against the
  *    retained run — the [[graft.discovery.PhashDup]] policy, so only
  *    overflow×overflow pairs can be lost; per-row work stays ≤
  *    maxBucket comparisons and the extra output is true near-dup
  *    pairs, which is the operator's honest result anyway.
  * Giant exact-duplicate groups should be collapsed by
  * [[Dedup.exactKeepFirst]] / fingerprint dedup before near-dup
  * mining — pair OUTPUT over a group of g duplicates is inherently
  * O(g²).
  */
object Banding {

  /** keyed must have columns (id: string, key: long). Returns distinct
    * (id1, id2) with id1 < id2.
    *
    * `truncated` (optional) observes the cap as a NONZERO-MEANS-TRUNCATED
    * indicator, not a precise count: it is updated inside a
    * transformation, so task retries, speculation, or a second action
    * over the same frame can add the same occurrences again (standard
    * accumulator-in-transformation semantics). Zero after an action DOES
    * reliably mean no bucket overflowed; a nonzero value means candidate
    * recall was bounded by maxBucket — callers that must not lose those
    * ids should collapse exact duplicates first (the usual cause of
    * over-cap buckets) or raise the cap. An exact occurrence count, if
    * ever needed, is a one-line aggregation over `keyed`
    * (`count - sum(least(bucket_size, maxBucket))` per key). */
  def candidatePairs(keyed: DataFrame, maxBucket: Int = 1024,
      truncated: Option[org.apache.spark.util.LongAccumulator] = None): DataFrame = {
    val spark = keyed.sparkSession
    import spark.implicits._
    keyed
      .repartition(col("key"))
      .sortWithinPartitions(col("key"), col("id"))
      .select(col("key"), col("id"))
      .as[(Long, String)]
      .mapPartitions { it =>
        new Iterator[(String, String)] {
          private val out = scala.collection.mutable.Queue.empty[(String, String)]
          private val run = scala.collection.mutable.ArrayBuffer.empty[String]
          private var curKey: Long = Long.MinValue
          private var haveKey = false
          private def advance(): Unit = {
            while (out.isEmpty && it.hasNext) {
              val (key, id) = it.next()
              if (!haveKey || key != curKey) { run.clear(); curKey = key; haveKey = true }
              if (run.length < maxBucket) {
                var i = 0
                while (i < run.length) {
                  val oid = run(i)
                  // sorted within the run: oid <= id; equal ids can only
                  // come from duplicate input rows — skip self-pairs
                  if (oid != id) out += ((oid, id))
                  i += 1
                }
                run += id
              } else truncated.foreach(_.add(1L))
            }
          }
          def hasNext: Boolean = { advance(); out.nonEmpty }
          def next(): (String, String) = { advance(); out.dequeue() }
        }
      }
      .toDF("id1", "id2")
      .distinct()
  }

  /** Exact-Jaccard near-dup pairs emitted straight FROM the run-scan:
    * `keyed` must have columns (id: string, key: long, sh: array<string>
    * — the doc's shingle array); every capped same-key run verifies its
    * pairs in place and only pairs with jaccard ≥ threshold leave the
    * operator.
    *
    * Why this exists next to [[candidatePairs]] (the r6 ngram
    * optimization, same rationale as [[cosinePairs]]): on a corpus whose
    * shingles are corpus-frequent (average df ≈ 30 on the synthetic
    * captions), the slim-candidates shape materializes O(Σ df²) pairs
    * through a distinct shuffle and a payload join — measured 11.1M
    * candidate pairs from 100k docs, ~11 s of the 14 s op. Carrying the
    * shingle payload through the banding exchange once per key is
    * O(input × bands) shuffle instead, and only TRUE pairs (plus the
    * output-sized distinct) leave the scan.
    *
    * CAP POLICY parity with [[candidatePairs]] (strict first-`maxDf`,
    * NOT the cosinePairs overflow-scoring policy): the ngram oracle's
    * candidate rule is "both ids within the shingle's first maxDf by id
    * rank", so an overflow row must get NO pairs from that key.
    *
    * Numeric parity with [[Dedup.jaccard]]: per-doc distinct shingle
    * sets (String equality ≡ UTF8String binary equality on valid UTF-8),
    * inter/union counted as ints, one int→double division — identical
    * IEEE result. Sorting happens INSIDE the scan with one comparator
    * (String.compareTo), so merge-intersection order is self-consistent
    * regardless of any engine-side collation. */
  def jaccardPairs(keyed: DataFrame, maxDf: Int, threshold: Double,
      truncated: Option[org.apache.spark.util.LongAccumulator] = None): DataFrame = {
    val spark = keyed.sparkSession
    import spark.implicits._
    keyed
      .repartition(col("key"))
      .sortWithinPartitions(col("key"), col("id"))
      .select(col("key"), col("id"), col("sh"))
      .as[(Long, String, Array[String])]
      .mapPartitions { it =>
        new Iterator[(String, String, Double)] {
          private val out =
            scala.collection.mutable.Queue.empty[(String, String, Double)]
          private val ids = scala.collection.mutable.ArrayBuffer.empty[String]
          private val sets = scala.collection.mutable.ArrayBuffer.empty[Array[String]]
          private var curKey: Long = Long.MinValue
          private var haveKey = false
          // sorted distinct copy (one comparator for sort AND merge)
          private def norm(a: Array[String]): Array[String] = {
            val c = a.clone()
            java.util.Arrays.sort(c.asInstanceOf[Array[AnyRef]])
            var w = 0
            var i = 0
            while (i < c.length) {
              if (w == 0 || c(w - 1) != c(i)) { c(w) = c(i); w += 1 }
              i += 1
            }
            if (w == c.length) c else java.util.Arrays.copyOf(c, w)
          }
          private def jac(a: Array[String], b: Array[String]): Double = {
            var i = 0; var j = 0; var inter = 0
            while (i < a.length && j < b.length) {
              val c = a(i).compareTo(b(j))
              if (c == 0) { inter += 1; i += 1; j += 1 }
              else if (c < 0) i += 1
              else j += 1
            }
            val uni = a.length + b.length - inter
            if (uni > 0) inter.toDouble / uni.toDouble else 0.0
          }
          private def advance(): Unit = {
            while (out.isEmpty && it.hasNext) {
              val (key, id, sh) = it.next()
              if (!haveKey || key != curKey) {
                ids.clear(); sets.clear(); curKey = key; haveKey = true
              }
              if (ids.length < maxDf) {
                val ns = norm(sh)
                var i = 0
                while (i < ids.length) {
                  // sorted within the run: ids(i) <= id; equal ids can
                  // only come from duplicate input rows — skip self-pairs
                  if (ids(i) != id) {
                    val v = jac(sets(i), ns)
                    if (v >= threshold) out += ((ids(i), id, v))
                  }
                  i += 1
                }
                ids += id; sets += ns
              } else truncated.foreach(_.add(1L))
            }
          }
          def hasNext: Boolean = { advance(); out.nonEmpty }
          def next(): (String, String, Double) = { advance(); out.dequeue() }
        }
      }
      .toDF("id1", "id2", "jaccard")
      .distinct()
  }

  /** Cosine-scored near-dup pairs emitted straight FROM the run-scan:
    * `keyed` must have columns (id: string, key: long, v: array<float>);
    * every capped same-key run scores its pairs in place and only pairs
    * with cos ≥ threshold leave the operator — candidate pairs never
    * cross a shuffle.
    *
    * Why this exists next to [[candidatePairs]]: on clustered or skewed
    * corpora (the realistic embedding regime) the hyperplane buckets sit
    * AT the cap, so slim-candidates-then-payload-join materializes up to
    * tables·buckets·maxBucket²/2 candidate rows through a shuffle join —
    * O(candidates) shuffle state, which ran a 100k-row clustered corpus
    * out of execution memory. Scoring inside the scan is O(input) shuffle
    * (the vector rides the banding exchange once per table) + O(true
    * pairs) output: the [[graft.discovery.PhashDup.duplicatePairs]]
    * pattern with the verify step fused in.
    *
    * Numeric parity: mirrors [[graft.ops.Similarity.cosine]] exactly —
    * per-element float→double casts, left-to-right accumulation, and the
    * zero-norm guard (cos := −1, never emitted) — so results on
    * null-free input are bit-identical to the former candidate-join
    * shape. Null vectors are filtered before the scan (the join shape
    * dropped them via the null cosine; the run-scan would NPE on them
    * instead) — on input WITH nulls the shapes can differ at exactly-
    * at-cap buckets, where the join shape let a null row consume a cap
    * slot before dropping it and the filter frees that slot. */
  def cosinePairs(keyed: DataFrame, maxBucket: Int, threshold: Double,
      truncated: Option[org.apache.spark.util.LongAccumulator] = None): DataFrame = {
    val spark = keyed.sparkSession
    import spark.implicits._
    keyed
      .filter(col("v").isNotNull)
      .repartition(col("key"))
      .sortWithinPartitions(col("key"), col("id"))
      .select(col("key"), col("id"), col("v"))
      .as[(Long, String, Array[Float])]
      .mapPartitions { it =>
        new Iterator[(String, String, Double)] {
          private val out =
            scala.collection.mutable.Queue.empty[(String, String, Double)]
          private val ids = scala.collection.mutable.ArrayBuffer.empty[String]
          private val vecs = scala.collection.mutable.ArrayBuffer.empty[Array[Float]]
          private val norms = scala.collection.mutable.ArrayBuffer.empty[Double]
          private var curKey: Long = Long.MinValue
          private var haveKey = false
          private def normOf(v: Array[Float]): Double = {
            var s = 0.0; var i = 0
            while (i < v.length) { val x = v(i).toDouble; s += x * x; i += 1 }
            math.sqrt(s)
          }
          private def advance(): Unit = {
            while (out.isEmpty && it.hasNext) {
              val (key, id, v) = it.next()
              if (!haveKey || key != curKey) {
                ids.clear(); vecs.clear(); norms.clear(); curKey = key; haveKey = true
              }
              // EVERY row — retained or overflow — scores against the
              // retained run (the PhashDup cap policy the operator doc
              // promises: only overflow×overflow pairs can be lost);
              // only the first maxBucket rows JOIN the run.
              val nv = normOf(v)
              var i = 0
              while (i < ids.length) {
                // sorted within the run: ids(i) <= id; equal ids can
                // only come from duplicate input rows — skip self-pairs.
                // Length-mismatched vectors are skipped too: the
                // candidates-join shape's zip_with null-pads ragged
                // arrays into a null cosine that its filter drops, so
                // a truncated-prefix dot here would fabricate a pair
                // the join shape (and the exact-cosine soundness
                // oracle) never emits.
                if (ids(i) != id && vecs(i).length == v.length) {
                  val ov = vecs(i)
                  var dot = 0.0; var d = 0
                  val n = v.length
                  while (d < n) { dot += ov(d).toDouble * v(d).toDouble; d += 1 }
                  val denom = norms(i) * nv
                  val cos = if (denom > 0.0) dot / denom else -1.0
                  if (cos >= threshold) out += ((ids(i), id, cos))
                }
                i += 1
              }
              if (ids.length < maxBucket) { ids += id; vecs += v; norms += nv }
              else truncated.foreach(_.add(1L))
            }
          }
          def hasNext: Boolean = { advance(); out.nonEmpty }
          def next(): (String, String, Double) = { advance(); out.dequeue() }
        }
      }
      .toDF("id1", "id2", "cos")
      .distinct()
  }
}
