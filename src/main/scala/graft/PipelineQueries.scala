package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.detect.Scorer
import graft.discovery.PhashDup
import graft.loop.ValidationRun
import graft.synth.{GenConfig, ImageGen}

/** Memoized pipeline artifacts so the Verify/Bench harness doesn't refit
  * models per query. Keyed by row count; one SparkSession per process. */
object PipelineCache {
  private val cache = scala.collection.concurrent.TrieMap.empty[String, AnyRef]

  private def cached[T <: AnyRef](key: String)(mk: => T): T =
    cache.getOrElseUpdate(key, mk).asInstanceOf[T]

  def genCfg(n: Long): GenConfig = GenConfig(n = n)

  def images(spark: SparkSession, n: Long): DataFrame =
    cached(s"images/$n") { ImageGen.images(spark, genCfg(n)).cache() }

  def models(spark: SparkSession, n: Long): Scorer.Models =
    cached(s"models/$n") { Scorer.fit(spark, images(spark, n)) }

  def scored(spark: SparkSession, n: Long): DataFrame =
    cached(s"scored/$n") {
      val dupDrop = PhashDup.dropIds(images(spark, n))
      Scorer.withScores(images(spark, n), models(spark, n), dupDrop).cache()
    }

  def decisions(spark: SparkSession, n: Long): DataFrame =
    cached(s"decisions/$n") {
      val s = scored(spark, n)
      val knownCount = ImageGen.knownFaults(spark, genCfg(n)).count()
      val withStatus = s.withColumn("status", lit("clean"))
      val (t, _) = graft.discovery.Thresholds.discover(
        withStatus, "invalidity_score", "status", knownCount)
      Scorer.withDecision(s, t)
        .select("image_id", "decision", "invalidity_score", "scrubbed_caption")
    }
}

/** Rows-only (non-SQL-expressible) queries over the synthetic
  * image+caption pipeline — the engine's flagship operators. The driver
  * records a rows-only check for these (no oracleSql entries). */
object PipelineQueries {

  private val N = 2000L

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // M5–M8 + P3: full score → threshold → keep/drop pass
    "qf_decisions" -> ((s, _) =>
      PipelineCache.decisions(s, N).orderBy("image_id")),

    // Accuracy evidence: keep/drop confusion counts + F1 vs the seeded
    // oracle labels (BASELINE.md F1 ≥ 0.99 gate)
    "qf_f1" -> ((s, _) => {
      val dec = PipelineCache.decisions(s, N)
      val exp = ImageGen.expected(s, PipelineCache.genCfg(N))
        .select(col("image_id"), col("decision").as("expected"))
      val j = dec.join(exp, Seq("image_id")).cache()
      val tp = j.filter(col("decision") === "drop" && col("expected") === "drop").count()
      val fp = j.filter(col("decision") === "drop" && col("expected") === "keep").count()
      val fn = j.filter(col("decision") === "keep" && col("expected") === "drop").count()
      val f1 = graft.eval.Metrics.f1(tp, fp, fn)
      import s.implicits._
      Seq((tp, fp, fn, f1)).toDF("tp", "fp", "fn", "f1")
    }),

    // M16: exact scrubbed-caption equality per fault class
    "qf_scrub_equality" -> ((s, _) => {
      val dec = PipelineCache.decisions(s, N)
        .select("image_id", "scrubbed_caption")
      val exp = ImageGen.expected(s, PipelineCache.genCfg(N))
        .select(col("image_id"), col("scrubbed_caption").as("expected_scrub"),
          col("fault_class"))
      dec.join(exp, Seq("image_id"))
        .groupBy(col("fault_class"))
        .agg(count(lit(1)).as("n"),
          sum(when(col("scrubbed_caption") === col("expected_scrub"), 1L)
            .otherwise(0L)).as("n_exact"))
        .orderBy("fault_class")
    }),

    // North-rule phash banding: verified near-duplicate pairs
    "qf_phash_dup_pairs" -> ((s, _) =>
      PhashDup.duplicatePairs(PipelineCache.images(s, N))
        .orderBy("id1", "id2")),

    // M2: langid model predictions per language
    "qf_langid_counts" -> ((s, _) => {
      val m = PipelineCache.models(s, N)
      val predUdf = udf((c: String) => m.langId.value.bestLang(c)._1)
      PipelineCache.images(s, N)
        .select(predUdf(col("caption")).as("pred_lang"))
        .groupBy("pred_lang").agg(count(lit(1)).as("n"))
        .orderBy("pred_lang")
    }),

    // M15: the 3-round oracle loop's metrics history (TPR/FNR/PD/ND/UD)
    "qf_metrics_loop" -> ((s, _) => {
      val res = PipelineLoop.cachedLoop(s)
      import s.implicits._
      res.metrics.toDF().orderBy("run")
    })
  )

  def oracleSql: Map[String, String] = Map.empty
}

/** Memoized full-loop run for Verify (deletes + recreates its own
  * checkpoint dir so each Verify invocation runs all rounds fresh). */
object PipelineLoop {
  @volatile private var res: ValidationRun.RunResult = _
  def cachedLoop(spark: SparkSession): ValidationRun.RunResult = synchronized {
    if (res == null) {
      val dir = "target/graft-verify-loop"
      deleteRecursively(new java.io.File(dir))
      res = ValidationRun.run(spark,
        ValidationRun.RunConfig(n = 1000L, rounds = 3, outDir = dir))
    }
    res
  }

  def deleteRecursively(f: java.io.File): Unit = {
    if (f.isDirectory) f.listFiles().foreach(deleteRecursively)
    f.delete(): Unit
  }
}
