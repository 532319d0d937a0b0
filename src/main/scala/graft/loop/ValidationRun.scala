package graft.loop

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.detect.Scorer
import graft.discovery.{PhashDup, Thresholds}
import graft.engine.TableIO
import graft.eval.Metrics
import graft.synth.{GenConfig, ImageGen}

/** The iterative constraint-discovery / fault-detection / oracle-confirm
  * loop — the Spark rebuild of the reference CLI harness
  * (/root/reference/testScript.py:29-46) and the `validate` spine
  * (DQTestToolHelper.py:59-240):
  *
  *   fit models → score every row → discover thresholds → suspicious
  *   set → oracle confirms suspicious∩known as actual faults, rest
  *   valid → metrics row → checkpoint → next round.
  *
  * Statuses live in an append-only audit table keyed by round (never
  * per-row UPDATEs — the reference's O(n) UPDATE loop at
  * DQTestToolHelper.py:161-162 becomes one columnar write per round).
  * Each round checkpoints statuses + metrics + per-partition lineage;
  * a re-run with the same outDir resumes after the last completed round
  * (north-rule checkpointed resume).
  */
object ValidationRun {

  final case class RunConfig(
      n: Long = 2000L,
      rounds: Int = 3,
      seed: Long = 42L,
      faultPct: Int = 5,
      outDir: String = "target/graft-run",
      parts: Int = 32,
      withBytes: Boolean = false)

  final case class RunResult(
      decisions: DataFrame,
      metrics: Seq[Metrics.RunMetrics],
      thresholds: Seq[Double],
      completedRounds: Int)

  private def statusPath(cfg: RunConfig, r: Int) = s"${cfg.outDir}/statuses/round=$r"
  private def metricsPath(cfg: RunConfig, r: Int) = s"${cfg.outDir}/metrics/round=$r"
  private def lineagePath(cfg: RunConfig, r: Int) = s"${cfg.outDir}/lineage/round=$r"
  private def auditPath(cfg: RunConfig, r: Int) = s"${cfg.outDir}/audit/round=$r"
  private def thresholdPath(cfg: RunConfig, r: Int) = s"${cfg.outDir}/thresholds/round=$r"

  /** A round is resumable only when EVERY artifact it writes exists —
    * statuses alone are written first, so a crash between the status
    * write and the metrics/audit/lineage writes must RE-RUN the round
    * (all writes are overwrite-idempotent), not skip it: skipping left a
    * permanent per-round hole that silently shortened the TPR history
    * every later round's TPGR is computed over, and dropped the round's
    * audit fixture from what the DuckDB oracle recomputes. */
  private def roundComplete(spark: SparkSession, cfg: RunConfig, r: Int): Boolean =
    Seq(statusPath(cfg, r), metricsPath(cfg, r), auditPath(cfg, r),
      lineagePath(cfg, r), thresholdPath(cfg, r))
      .forall(TableIO.exists(spark, _))

  /** Bounded wait on an Observation: the metrics must arrive with the
    * write action that carries them — if they ever fail to propagate,
    * fail fast instead of hanging the loop forever on `obs.get`. */
  private def observed(obs: org.apache.spark.sql.Observation,
      timeoutSec: Int = 300): Map[String, Any] = {
    import java.util.concurrent.{Executors, TimeUnit, TimeoutException}
    val ex = Executors.newSingleThreadExecutor { r =>
      val t = new Thread(r, "graft-observation-wait"); t.setDaemon(true); t
    }
    try {
      val f = ex.submit(new java.util.concurrent.Callable[Map[String, Any]] {
        def call(): Map[String, Any] = obs.get
      })
      try f.get(timeoutSec.toLong, TimeUnit.SECONDS)
      catch {
        case _: TimeoutException => throw new IllegalStateException(
          s"observation ${obs.name} not materialized within ${timeoutSec}s " +
            "of its carrying write action")
      }
    } finally { ex.shutdownNow(): Unit }
  }

  def run(spark: SparkSession, cfg: RunConfig): RunResult = {
    import spark.implicits._
    val gen = GenConfig(cfg.n, cfg.seed, cfg.faultPct, cfg.withBytes, cfg.parts)
    val images = ImageGen.images(spark, gen).cache()
    val known = ImageGen.knownFaults(spark, gen).select("image_id").cache()
    val knownCount = known.count()

    // Constraint models: warm-start from the checkpoint when resuming
    // (DQTestToolHelper.py:109-111), else fit once and checkpoint. The
    // expensive caption-scanning pass (LM perplexity, langid, rules,
    // scrub) runs ONCE into a raw-signals cache; the per-round refit
    // below recalibrates from it without re-scanning captions.
    val models = Scorer.fitOrLoad(spark, images, Some(s"${cfg.outDir}/model"),
      fingerprint = s"n=${cfg.n};seed=${cfg.seed};faultPct=${cfg.faultPct};" +
        s"scrub=${graft.scrub.Scrub.version}")
    val dupDrop = PhashDup.dropIds(images).cache()
    val raw = Scorer.withRawSignals(images, models, dupDrop)
      .select((Seq("image_id", "pred_lang", "ppl_raw", "scrubbed_caption") ++
        Scorer.scoreNames.filterNot(_ == "score_ppl")).map(col): _*)
      .cache()

    // Per-round model state with label feedback (the reference retrains
    // every iteration on the updated table, testScript.py:43 →
    // DQTestToolHelper.py:130): per-lang perplexity reference quantiles
    // refit from the believed-clean population, and confirmed faults get
    // the +1 label offset so they stay above threshold on re-score (the
    // reference's `+y`, DQTestToolHelper.py:153-157).
    val confirmedOffset =
      when(col("status").startsWith("actualFault"), lit(1.0)).otherwise(lit(0.0))
    def scoreRound(statuses: DataFrame): DataFrame = {
      val stRaw = raw.join(statuses, Seq("image_id"))
      val (byLang, global) = Scorer.recalibrate(
        stRaw.filter(!col("status").startsWith("actualFault")),
        fallback = (models.pplRefByLang, models.pplRef))
      Scorer.scoresFromSignals(stRaw, byLang, global, Some(confirmedOffset))
    }

    // Resume: last round whose checkpoints ALL completed (see
    // roundComplete — a partially-written round re-runs).
    val resumeFrom = (1 to cfg.rounds)
      .takeWhile(r => roundComplete(spark, cfg, r)).lastOption.getOrElse(0)
    var statuses =
      if (resumeFrom == 0)
        images.select(col("image_id"), lit("clean").as("status"))
      else TableIO.read(spark, statusPath(cfg, resumeFrom)).select("image_id", "status")

    val metricsHist = scala.collection.mutable.ArrayBuffer.empty[Metrics.RunMetrics]
    val thresholds = scala.collection.mutable.ArrayBuffer.empty[Double]
    // Reload prior rounds' metrics AND thresholds so TPGR spans the full
    // history on resume and RunResult.thresholds stays aligned 1:1 with
    // RunResult.metrics (a resumed run previously returned a short
    // thresholds list). Checkpoints written before the tpgr column
    // existed stay resumable: the missing column reads as 0.0 (TPGR of a
    // one-run history) instead of failing the whole resume on
    // AnalysisException. roundComplete guarantees both paths exist for
    // every resumed round.
    (1 to resumeFrom).foreach { r =>
      val raw = TableIO.read(spark, metricsPath(cfg, r))
      val compat =
        if (raw.columns.contains("tpgr")) raw
        else raw.withColumn("tpgr", lit(0.0))
      metricsHist ++= compat.as[Metrics.RunMetrics].collect()
      thresholds += TableIO.read(spark, thresholdPath(cfg, r))
        .head().getAs[Double]("threshold")
    }

    val n = cfg.n
    val knownFlag = broadcast(known.withColumn("__known", lit(1)))
    // Previous round's flagged frame: kept cached until the NEXT round's
    // checkpoint write has materialized (its statuses projection feeds
    // that round's join), then released.
    var prevFlagged: Option[DataFrame] = None
    for (r <- (resumeFrom + 1) to cfg.rounds) {
      val st = scoreRound(statuses)
      val (t, _) = Thresholds.discover(st, "invalidity_score", "status", knownCount, n)
      thresholds += t

      // One flagged frame carries everything the round needs: suspicious
      // flag, oracle membership, old + new status. Oracle auto-confirm
      // semantics per testScript.py:38-40: suspicious∩known →
      // actualFaults_r, suspicious∖known → valid, confirmed frozen.
      val flagged = st
        .join(knownFlag, Seq("image_id"), "left")
        .withColumn("is_susp", col("invalidity_score") >= t)
        .withColumn("is_known", col("__known").isNotNull)
        .withColumn("status_new",
          when(col("status").startsWith("actualFault"), col("status"))
            .when(col("is_susp") && col("is_known"), lit(s"actualFaults_$r"))
            .when(col("is_susp"), lit("valid"))
            .otherwise(col("status")))
        .cache()

      // Metrics counts in ONE pass that is ALSO the checkpoint write
      // (formula parity — Evaluation.py:6-30; the reference re-scans per
      // metric): an Observation rides the status write, so one job
      // materializes the cache, writes the round's statuses, and
      // collects all six counts. (Round 3 spent a separate full agg
      // action here — at n=1000 the loop's cost is job count, not data.)
      val obs = org.apache.spark.sql.Observation(s"round_$r")
      TableIO.createOrReplace(
        flagged.observe(obs,
          sum(when(col("is_susp"), 1L).otherwise(0L)).as("faulty"),
          sum(when(col("is_susp") && col("is_known"), 1L).otherwise(0L)).as("eInterA"),
          sum(when(col("status_new").startsWith("actualFault"), 1L).otherwise(0L)).as("afNew"),
          sum(when(col("status").startsWith("actualFault"), 1L).otherwise(0L)).as("afOld"),
          sum(when(col("status").startsWith("actualFault") &&
            !col("status_new").startsWith("actualFault"), 1L).otherwise(0L)).as("afOldMinusNew"),
          sum(when(col("status_new").startsWith("actualFault") && !col("is_known"), 1L)
            .otherwise(0L)).as("afMinusE"))
          .select(col("image_id"), col("status_new").as("status")),
        statusPath(cfg, r))
      val c = observed(obs)
      val faultyRows = c("faulty").asInstanceOf[Long]
      val eInterA = c("eInterA").asInstanceOf[Long]
      val afNewN = c("afNew").asInstanceOf[Long]
      val afOldN = c("afOld").asInstanceOf[Long]
      val afOldMinusNew = c("afOldMinusNew").asInstanceOf[Long]
      val afMinusE = c("afMinusE").asInstanceOf[Long]
      val fnr = Metrics.falseNegativeRate(afOldMinusNew, afOldN)
      val tpr = Metrics.truePositiveRate(afNewN, faultyRows)
      // TPGR over the history up to and including this round — the
      // reference surfaces it per run (Evaluation.py:25-30, README:137)
      val tpgr = Metrics.truePositiveGrowthRate(
        metricsHist.map(_.truePositiveRate).toSeq :+ tpr)
      val m = Metrics.RunMetrics(
        run = r,
        previouslyDetected = Metrics.previouslyDetected(knownCount, eInterA),
        suspiciousDetected = Metrics.newlyDetected(faultyRows, faultyRows - eInterA),
        undetected = Metrics.undetected(knownCount, knownCount - eInterA),
        newlyDetected = Metrics.newlyDetected(faultyRows, afMinusE),
        truePositiveRate = tpr,
        falsePositiveRate = 1.0 - tpr,
        trueNegativeRate = 1.0 - fnr,
        falseNegativeRate = fnr,
        tpgr = tpgr)
      metricsHist += m

      // Remaining checkpoints: metrics row + per-partition lineage +
      // the per-round AUDIT fixture, all from the already-cached flagged
      // frame (the status write above populated the cache). The audit
      // fixture carries exactly the per-row facts the metric formulas
      // consume — (is_susp, is_known, status_old, status_new) — so an
      // independent engine (the DuckDB oracle) can recompute every
      // TPR/FNR/PD/ND/UD/TPGR value from it.
      //
      // r6: the four writes are mutually independent reads of the same
      // materialized cache, so they run as CONCURRENT Spark actions
      // (guide §2.6 — actions are only sequential because driver code
      // calls them sequentially); a round's wall cost is one write
      // latency, not four. Outputs and resume semantics are unchanged —
      // roundComplete still requires all of them to exist.
      locally {
        import scala.concurrent.{Await, Future}
        import scala.concurrent.ExecutionContext.Implicits.global
        val writes = Seq(
          Future(TableIO.createOrReplace(Seq(m).toDF(), metricsPath(cfg, r))),
          // threshold checkpoint (own tiny file, NOT a new metrics
          // column — the qf_metrics_loop oracle fixture's schema stays
          // frozen); read back on resume so thresholds align with
          // metrics
          Future(TableIO.createOrReplace(
            Seq((r, t)).toDF("run", "threshold"), thresholdPath(cfg, r))),
          Future(TableIO.createOrReplace(
            flagged.select(col("image_id"), col("is_susp"), col("is_known"),
              col("status").as("status_old"), col("status_new"),
              lit(r).as("run")),
            auditPath(cfg, r))),
          Future {
            val lineage = flagged
              .withColumn("pid", spark_partition_id())
              .groupBy(col("pid").as("partition_id"))
              .agg(count(lit(1)).as("rows_in"),
                sum(when(col("is_susp"), 1L).otherwise(0L)).as("rows_dropped"))
              .withColumn("rows_kept", col("rows_in") - col("rows_dropped"))
              .withColumn("run_id", lit(r))
              .withColumn("completed_at", current_timestamp())
            TableIO.createOrReplace(lineage, lineagePath(cfg, r))
          })
        Await.result(Future.sequence(writes),
          scala.concurrent.duration.Duration(600, "s")): Unit
      }

      // Next round reads the statuses straight off the cached frame (its
      // content is byte-identical to the checkpoint just written) — no
      // parquet round-trip per round. The checkpoint stays the resume
      // source of truth for fresh processes. Every 5th round the
      // just-written checkpoint is read back instead: the cache
      // shortcuts EXECUTION but not ANALYSIS, so chaining frames would
      // nest every prior round's logical plan (unbounded analysis time /
      // stack depth for large cfg.rounds, and an eviction under memory
      // pressure would recompute through every predecessor); the
      // periodic read truncates the lineage at a bounded depth.
      statuses =
        if (r % 5 == 0)
          TableIO.read(spark, statusPath(cfg, r)).select("image_id", "status")
        else flagged.select(col("image_id"), col("status_new").as("status"))
      prevFlagged.foreach(_.unpersist())
      prevFlagged = Some(flagged)
    }

    // Final decisions from the final-state model (refit on the last
    // checkpointed statuses — deterministic for fresh AND resumed runs).
    // ONE scoreRound invocation feeds BOTH the threshold refit and the
    // decisions: the recalibration inside uses percentile_approx, whose
    // result can depend on partition/merge order past the sketch's exact
    // regime, so discovering the threshold on one scoring pass and
    // applying it to another could flip boundary rows at large cfg.n.
    // The shared plan reads statuses from the checkpoint (byte-identical
    // to the cached frame's content), so the loop cache is released here
    // rather than holding executor memory for as long as callers keep
    // re-evaluating the returned frame.
    val finalStatuses =
      if (cfg.rounds > 0)
        TableIO.read(spark, statusPath(cfg, cfg.rounds)).select("image_id", "status")
      else statuses
    prevFlagged.foreach(_.unpersist())
    val finalScored = scoreRound(finalStatuses)
    val tFinal = Thresholds.discover(
      finalScored, "invalidity_score", "status", knownCount, n)._1
    val decisions = Scorer.withDecision(finalScored, tFinal)
      .select("image_id", "decision", "invalidity_score", "scores",
        "scrubbed_caption", "status")
    RunResult(decisions, metricsHist.toSeq, thresholds.toSeq,
      cfg.rounds)
  }

  /** One-shot (no oracle loop) score → threshold → decide pass; the
    * flagship entry query. */
  def oneShot(spark: SparkSession, gen: GenConfig): DataFrame = {
    val images = ImageGen.images(spark, gen)
    val knownCount = ImageGen.knownFaults(spark, gen).count()
    val models = Scorer.fit(spark, images)
    val dupDrop = PhashDup.dropIds(images)
    val scored = Scorer.withScores(images, models, dupDrop).cache()
    val withStatus = scored.withColumn("status", lit("clean"))
    val (t, _) = Thresholds.discover(withStatus, "invalidity_score", "status", knownCount)
    Scorer.withDecision(scored, t)
      .select("image_id", "decision", "invalidity_score", "scrubbed_caption")
  }

  def flagship(spark: SparkSession): DataFrame =
    graft.PipelineCache.decisions(spark, 2000L)
}
