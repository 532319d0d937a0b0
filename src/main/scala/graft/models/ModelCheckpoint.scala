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
  */
object ModelCheckpoint {

  private case class State(
      langId: LangIdModel,
      lm: NGramLMModel,
      pplRef: Double,
      pplRefByLang: Map[String, Double]) extends Serializable

  def save(spark: SparkSession, m: Scorer.Models, dir: String): Unit = {
    import spark.implicits._
    val state = State(m.langId.value, m.lm.value, m.pplRef, m.pplRefByLang)
    val baos = new java.io.ByteArrayOutputStream()
    val oos = new java.io.ObjectOutputStream(baos)
    oos.writeObject(state); oos.close()
    TableIO.createOrReplace(Seq(baos.toByteArray).toDF("state"), dir)
  }

  def load(spark: SparkSession, dir: String): Option[Scorer.Models] = {
    if (!TableIO.exists(spark, dir)) return None
    val bytes = TableIO.read(spark, dir).head().getAs[Array[Byte]](0)
    val ois = new java.io.ObjectInputStream(new java.io.ByteArrayInputStream(bytes))
    val state = ois.readObject().asInstanceOf[State]
    ois.close()
    Some(Scorer.Models(
      spark.sparkContext.broadcast(state.langId),
      spark.sparkContext.broadcast(state.lm),
      state.pplRef,
      state.pplRefByLang))
  }
}
