package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.rules.HeuristicRules

class RulesSpec extends AnyFunSuite {
  lazy val spark = GraftTestSpark.spark
  import spark.implicits._

  private def scoreOf(caption: String, w: Int = 512, h: Int = 512): Map[String, Double] = {
    val df = Seq((caption, w, h)).toDF("caption", "w", "h")
      .select(
        HeuristicRules.lengthScore(col("caption")).as("len"),
        HeuristicRules.symbolScore(col("caption")).as("sym"),
        HeuristicRules.repetitionScore(col("caption")).as("rep"),
        HeuristicRules.resolutionScore(col("w"), col("h")).as("res"),
        HeuristicRules.aspectScore(col("w"), col("h")).as("asp"))
    val r = df.head()
    Map("len" -> r.getDouble(0), "sym" -> r.getDouble(1), "rep" -> r.getDouble(2),
      "res" -> r.getDouble(3), "asp" -> r.getDouble(4))
  }

  test("clean caption scores ~0 on all rules") {
    val s = scoreOf("a photo of a dog running on the beach at sunset")
    s.foreach { case (k, v) => assert(v <= 0.05, s"$k = $v") }
  }

  test("too-short caption trips length rule") {
    assert(scoreOf("dog")("len") == 1.0)
  }

  test("too-long caption trips length rule") {
    assert(scoreOf(Array.fill(300)("word").mkString(" "))("len") == 1.0)
  }

  test("symbol soup trips symbol rule") {
    assert(scoreOf("cat $ # @ ! % ^ & * ( ) [ ] { }")("sym") >= 0.9)
  }

  test("repetition trips repetition rule") {
    assert(scoreOf(Array.fill(30)("red ball").mkString(" "))("rep") >= 0.9)
  }

  test("low resolution trips resolution rule") {
    assert(scoreOf("a normal caption of decent length", 8, 8)("res") >= 0.9)
  }

  test("extreme aspect trips aspect rule") {
    assert(scoreOf("a normal caption of decent length", 1024, 16)("asp") >= 1.0)
  }

  test("normal resolution/aspect pass") {
    val s = scoreOf("a normal caption of decent length", 640, 480)
    assert(s("res") == 0.0 && s("asp") == 0.0)
  }

  test("null caption is max-length-violation not NPE") {
    val df = Seq((null: String, 512, 512)).toDF("caption", "w", "h")
      .select(HeuristicRules.lengthScore(col("caption")).as("len"))
    assert(df.head().getDouble(0) == 1.0)
  }
}
