package graft
// (50k-row bounded-fit coverage added round 2)

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.explain.ClusterExplainer

class ExplainSpec extends AnyFunSuite {
  lazy val spark = GraftTestSpark.spark
  import spark.implicits._

  test("kmeans clustering separates distinct score signatures") {
    // two obvious fault families: pure length faults vs pure symbol faults
    val rows = (1 to 50).map(i => (f"a$i%03d", 1.0, 0.0)) ++
      (1 to 50).map(i => (f"b$i%03d", 0.0, 1.0))
    val df = rows.toDF("image_id", "score_len", "score_symbol")
    val clustered = ClusterExplainer.clusterFaulty(df, Seq("score_len", "score_symbol"), 2)
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    val aClusters = clustered.filter(_._1.startsWith("a")).values.toSet
    val bClusters = clustered.filter(_._1.startsWith("b")).values.toSet
    assert(aClusters.size == 1 && bClusters.size == 1 && aClusters != bClusters)
  }

  test("tree rules name the discriminating attribute") {
    val rows = (1 to 100).map(i => (0.02 * (i % 5), 0.01 * (i % 3), 0.0)) ++
      (1 to 100).map(i => (0.9 + 0.002 * (i % 5), 0.01 * (i % 3), 1.0))
    val df = rows.toDF("score_len", "score_symbol", "label")
    val rules = ClusterExplainer.treeRules(df, Seq("score_len", "score_symbol"))
    assert(rules.nonEmpty)
    assert(rules.exists(r => r.contains("score_len") && r.endsWith("invalid")), rules.mkString("; "))
    assert(!rules.exists(_.contains("score_symbol")), "irrelevant attribute used")
  }

  test("faulty attributes: cluster-mean > p70 of means (M12)") {
    val df = (1 to 20).map(_ => (1.0, 0.0, 0.05)).toDF("a", "b", "c")
    val attrs = ClusterExplainer.faultyAttributes(df, Seq("a", "b", "c"))
    assert(attrs == Seq("a"))
  }

  test("clusterFaulty at 50k rows: bounded fit, full parallel assignment") {
    val big = spark.range(0, 50000).select(
      concat(lit("im"), col("id")).as("image_id"),
      pmod(col("id"), lit(2)).cast("double").as("score_a"),
      (lit(1.0) - pmod(col("id"), lit(2)).cast("double")).as("score_b"))
    val t0 = System.nanoTime()
    val out = ClusterExplainer.clusterFaulty(
      big, Seq("score_a", "score_b"), k = 2, maxFit = 2000)
    assert(out.count() == 50000L, "every faulty row must get a cluster id")
    assert(out.select("cluster_id").distinct().count() == 2L)
    val sec = (System.nanoTime() - t0) / 1e9
    assert(sec < 120.0, s"50k clustering took ${sec}s — fit not bounded?")
  }

  test("end-to-end explain on the scored pipeline emits rules per cluster") {
    val scored = PipelineCache.scored(spark, 2000L).withColumn("status", lit("clean"))
    val knownCount = graft.synth.ImageGen.knownFaults(spark, PipelineCache.genCfg(2000L)).count()
    val (t, med) = graft.discovery.Thresholds.discover(
      scored, "invalidity_score", "status", knownCount)
    val rules = ClusterExplainer.explain(scored, PipelineCache.scoreNames, t, med)
    val collected = rules.collect()
    assert(collected.nonEmpty)
    assert(collected.map(_.getInt(0)).distinct.length >= 2, "expected >= 2 clusters")

    // Partition-layout independence: the same scored rows in a different
    // physical layout must yield the SAME rules — the normal-side sample
    // is hash-ordered, not a bare limit (which takes whichever partitions
    // answer first).
    val relaid = scored.repartition(11)
    val rules2 = ClusterExplainer.explain(relaid, PipelineCache.scoreNames, t, med)
    assert(rules2.collect().toSeq.map(r => (r.getInt(0), r.getString(1))).sorted ==
      collected.toSeq.map(r => (r.getInt(0), r.getString(1))).sorted,
      "explain rules changed with partition layout")
  }
}
