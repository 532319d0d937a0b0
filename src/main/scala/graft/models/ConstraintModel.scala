package graft.models

import org.apache.spark.sql.{Column, DataFrame, SparkSession}

/** Pluggable constraint-discovery model registry — the Spark survival of
  * the reference's `PatternDiscovery` ABC (tuneAndTrain /
  * assignInvalidityScore, /root/reference/backendClasses/
  * PatternDiscovery.py:3-15) and its model-zoo dispatch (M2,
  * DQTestToolHelper.py:104-125). A model fits corpus-level state in one
  * or two global passes, and then contributes per-row invalidity score
  * *columns* (never per-row Python/driver loops).
  */
trait ConstraintModel {
  def name: String

  /** Global fit pass(es) over the corpus; returns broadcastable state. */
  def fit(spark: SparkSession, df: DataFrame): ModelState

  /** Per-rule score columns in [0,1] given the fitted state. */
  def scoreColumns(state: ModelState): Seq[(String, Column)]
}

/** Serializable fitted state, checkpointable for warm start — the analog
  * of the reference's saved model files
  * (DQTestToolHelper.py:109-111,136-143). */
trait ModelState extends Serializable

/** Named model-zoo dispatch — the Spark analog of the reference's
  * name → estimator map (M2, DQTestToolHelper.py:104-125). The generic
  * per-column scorer and the multivariate PCA detector register here;
  * LangId/NGramLM participate through [[graft.detect.Scorer]] (they
  * score text, not tabular features). */
object ConstraintModels {
  def registry(idCol: String): Map[String, ConstraintModel] = Map(
    "zscore_freq" -> new GenericQualityModel(idCol),
    "pca_residual" -> new PcaResidualModel(idCol),
    "mahalanobis" -> new MahalanobisModel(idCol))
}

/** Adapter exposing [[graft.generic.GenericQuality]]'s per-column
  * z-score / rare-level scorer through the zoo interface. */
final class GenericQualityModel(idCol: String) extends ConstraintModel {
  override def name: String = "zscore_freq"
  override def fit(spark: SparkSession, df: DataFrame): ModelState =
    GenericQualityState(graft.generic.GenericQuality.fit(df, idCol))
  override def scoreColumns(state: ModelState): Seq[(String, Column)] = state match {
    case GenericQualityState(m) => graft.generic.GenericQuality.scoreColumns(m)
    case other => throw new IllegalArgumentException(s"unexpected state $other")
  }
}

final case class GenericQualityState(model: graft.generic.GenericQuality.Model)
  extends ModelState
