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
  * web-scale n² landmine) are CAPPED: each run pairs only its first
  * `maxBucket` members (deterministic: smallest ids), so per-key work is
  * ≤ maxBucket²/2 no matter how hot the key. Giant exact-duplicate
  * groups should be collapsed by [[Dedup.exactKeepFirst]] /
  * fingerprint dedup before near-dup mining — pair OUTPUT over a group
  * of g duplicates is inherently O(g²).
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
}
