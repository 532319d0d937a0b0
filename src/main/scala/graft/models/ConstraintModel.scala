package graft.models

import org.apache.spark.broadcast.Broadcast
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

final case class LangIdState(model: Broadcast[LangIdModel]) extends ModelState
final case class LMState(model: Broadcast[NGramLMModel], pplRef: Double) extends ModelState
