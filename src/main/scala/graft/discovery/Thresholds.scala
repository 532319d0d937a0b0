package graft.discovery

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-level threshold discovery — reference-parity port of the
  * threshold-identification logic (M8,
  * /root/reference/backendClasses/DQTestToolHelper.py:167-198), specified
  * as a *total* function over Options (the reference leaves the
  * no-actual-faults branches to pandas NaN truthiness; we make them
  * explicit and table-test all branches).
  *
  * a = min score over confirmed-fault rows, b = max over confirmed-fault,
  * c = min over valid/clean, d = max over valid/clean.
  */
object Thresholds {

  final case class Inputs(
      nKnownFaults: Long,
      n: Long,
      p95: Double,
      pKnown: Double, // percentile(scores, 100 - 100*k/n); == max score when k == 0
      a: Option[Double],
      b: Option[Double],
      d: Option[Double])

  /** Faulty threshold (drop when score >= threshold; the engine
    * standardizes the reference's mixed >=/> on >=, SURVEY.md §4). */
  def faultyThreshold(in: Inputs): Double = {
    var t = if (in.nKnownFaults > 0) in.pKnown else in.p95
    (in.a, in.b, in.d) match {
      case (Some(a), Some(b), Some(d)) if b != 0.0 && b > d =>
        if (d > a && d < b) t = math.max(a, t)
        else if (a >= d) t = math.min(a, in.pKnown)
      case _ => ()
    }
    t
  }

  /** One-pass grouped min/max per status class (replaces the reference's
    * four full scans, DQTestToolHelper.py:175-182) plus one percentile
    * job; returns (faultyThreshold, normalThreshold=median). */
  def discover(
      scored: DataFrame,
      scoreCol: String,
      statusCol: String,
      nKnownFaults: Long): (Double, Double) =
    discover(scored, scoreCol, statusCol, nKnownFaults, scored.count())

  /** Variant with the row count precomputed (the loop knows n once —
    * saves one full-scan job per round). */
  def discover(
      scored: DataFrame,
      scoreCol: String,
      statusCol: String,
      nKnownFaults: Long,
      n: Long): (Double, Double) = {
    val pKnownFrac = if (n > 0) 1.0 - nKnownFaults.toDouble / n.toDouble else 1.0
    val percRow = scored.agg(
      expr(s"percentile($scoreCol, array(0.95D, $pKnownFrac, 0.5D))").as("ps"))
      .head()
    val ps = percRow.getSeq[Double](0)

    val statusClass: Column =
      when(col(statusCol).startsWith("actualFault"), "af")
        .when(col(statusCol) === "valid" || col(statusCol) === "clean", "vc")
        .otherwise("other")
    val mm = scored.groupBy(statusClass.as("sc"))
      .agg(min(col(scoreCol)).as("mn"), max(col(scoreCol)).as("mx"))
      .collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap

    val in = Inputs(
      nKnownFaults = nKnownFaults,
      n = n,
      p95 = ps(0),
      pKnown = ps(1),
      a = mm.get("af").map(_._1),
      b = mm.get("af").map(_._2),
      d = mm.get("vc").map(_._2))
    (faultyThreshold(in), ps(2))
  }
}
