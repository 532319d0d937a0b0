package graft.models

import org.apache.spark.sql.SparkSession
import graft.detect.Scorer
import graft.engine.TableIO

/** Persist / reload fitted constraint-model state — the warm-start seam
  * (S8): the reference saves its trained model to disk and reloads it on
  * the next run (/root/reference/backendClasses/DQTestToolHelper.py:
  * 109-111,136-143). State = langid weights + n-gram count tables +
  * per-language perplexity quantiles, stored as one binary row in the
  * checkpoint dir and re-broadcast on load.
  *
  * Every checkpoint carries a (format version, caller fingerprint)
  * header; `load` returns None — forcing a refit — when either
  * mismatches, so resuming an outDir after changing the generator
  * config or model code never silently reuses a model fit on different
  * data. Deserialization is restricted to the expected packages
  * (ObjectInputFilter) so a corrupted/foreign file can't instantiate
  * arbitrary classes.
  */
object ModelCheckpoint {

  /** Bump when the serialized model state shape or scoring semantics
    * change incompatibly. */
  val FormatVersion: Int = 2

  private case class State(
      langId: LangIdModel,
      lm: NGramLMModel,
      pplRef: Double,
      pplRefByLang: Map[String, Double]) extends Serializable

  def save(spark: SparkSession, m: Scorer.Models, dir: String,
      fingerprint: String = ""): Unit = {
    import spark.implicits._
    val state = State(m.langId.value, m.lm.value, m.pplRef, m.pplRefByLang)
    val baos = new java.io.ByteArrayOutputStream()
    val oos = new java.io.ObjectOutputStream(baos)
    oos.writeObject(state); oos.close()
    TableIO.createOrReplace(
      Seq((FormatVersion, fingerprint, baos.toByteArray))
        .toDF("version", "fingerprint", "state"),
      dir)
  }

  def load(spark: SparkSession, dir: String,
      fingerprint: String = ""): Option[Scorer.Models] = {
    if (!TableIO.exists(spark, dir)) return None
    try {
      val row = TableIO.read(spark, dir)
        .select("version", "fingerprint", "state").head()
      if (row.getInt(0) != FormatVersion || row.getString(1) != fingerprint)
        return None
      val bytes = row.getAs[Array[Byte]](2)
      val ois = new java.io.ObjectInputStream(
        new java.io.ByteArrayInputStream(bytes))
      ois.setObjectInputFilter(java.io.ObjectInputFilter.Config.createFilter(
        "graft.**;scala.**;java.lang.*;java.util.*;[D;[J;[I;[F;[B;!*"))
      val state = ois.readObject().asInstanceOf[State]
      ois.close()
      Some(Scorer.Models(
        spark.sparkContext.broadcast(state.langId),
        spark.sparkContext.broadcast(state.lm),
        state.pplRef,
        state.pplRefByLang))
    } catch {
      // pre-versioning layout, truncated file, filter rejection, …:
      // treat as "no usable checkpoint" and refit
      case _: Exception => None
    }
  }
}
