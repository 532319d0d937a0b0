package graft.detect

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Score post-processing utilities mirroring the reference's numeric
  * plumbing around per-feature invalidity scores. */
object Normalize {

  /** L2 column normalization (A6): divide each column by its L2 norm —
    * sklearn `normalize(axis=0)` parity
    * (/root/reference/backendClasses/Autoencoder.py:39,57). Two-phase:
    * one aggregate computing all norms, then a broadcast-scalar divide.
    * Order-independent and deterministic (fixes the reference's
    * positional-concat fragility, SURVEY.md §4 J3). */
  def l2(df: DataFrame, cols: Seq[String]): DataFrame = {
    val aggs = cols.map(c => sqrt(sum(col(c) * col(c))).as(c))
    val norms = df.agg(aggs.head, aggs.tail: _*).head()
    // one withColumns projection (columns are independent); zero-norm
    // columns pass through unchanged
    val scaled = cols.zipWithIndex.flatMap { case (c, i) =>
      val n = if (norms.isNullAt(i)) 0.0 else norms.getDouble(i)
      if (n > 0.0) Some(c -> (col(c) / lit(n))) else None
    }.toMap
    if (scaled.isEmpty) df else df.withColumns(scaled)
  }

  /** Per-feature conjunctive normal filter (P5): a record is normal iff
    * EVERY feature score ≤ that feature's median AND the record score ≤
    * the record threshold (/root/reference/backendClasses/
    * Testing.py:31-47 — the reference's dead-code variant, made live).
    * One percentile aggregate discovers all medians. */
  def normalPerFeature(
      df: DataFrame,
      scoreCols: Seq[String],
      recordScoreCol: String,
      recordThreshold: Double): DataFrame = {
    val percs = scoreCols.map(c => expr(s"percentile($c, 0.5D)").as(c))
    val medians = df.agg(percs.head, percs.tail: _*).head()
    // an empty frame (or an all-null column) yields a null percentile —
    // nothing can satisfy the conjunct, so the result is the empty frame
    // (same null guard convention as l2 above), not an NPE
    if (scoreCols.indices.exists(medians.isNullAt)) return df.limit(0)
    val conj: Column = scoreCols.zipWithIndex
      .map { case (c, i) => col(c) <= lit(medians.getDouble(i)) }
      .reduce(_ && _) && col(recordScoreCol) <= lit(recordThreshold)
    df.filter(conj)
  }
}
