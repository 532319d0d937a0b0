package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.detect.Scorer
import graft.models.ModelCheckpoint

class CheckpointSpec extends AnyFunSuite {
  lazy val spark = GraftTestSpark.spark

  test("model state round-trips through the checkpoint and scores identically") {
    val dir = "target/graft-model-ckpt"
    PipelineLoop.deleteRecursively(new java.io.File(dir))
    val images = PipelineCache.images(spark, 500L)
    val m1 = Scorer.fitOrLoad(spark, images, Some(dir)) // fits + saves
    val m2 = Scorer.fitOrLoad(spark, images, Some(dir)) // loads
    assert(m2.pplRef == m1.pplRef && m2.pplRefByLang == m1.pplRefByLang)
    val dup = PipelineCache.images(spark, 500L).select("image_id").limit(0)
    val s1 = Scorer.withScores(images, m1, dup)
      .select("image_id", "invalidity_score").collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    val s2 = Scorer.withScores(images, m2, dup)
      .select("image_id", "invalidity_score").collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(s1 == s2)
  }
}
