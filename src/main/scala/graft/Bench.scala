package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.detect.Scorer
import graft.discovery.{PhashDup, Thresholds}
import graft.synth.{GenConfig, ImageGen}

/** Benchmark main.
  *
  * Contract: emits a machine-readable JSON object on stdout and in
  * `target/bench.json`. Phases run CHEAP-FIRST (per-query timings →
  * dedup/ANN throughput → two-parallelism scaling) and the cumulative
  * JSON is re-printed and re-written after EVERY completed phase and
  * every scaling sample, so a harness kill at any point still leaves a
  * parseable line with everything measured so far — the LAST JSON line
  * on stdout is always the most complete. (Round 2 ran the expensive
  * scaling phase first with no intermediate flush; the harness timeout
  * left `rc=124, parsed:null` and zero driver-verified evidence.)
  *
  * Scaling protocol — PRE-REGISTERED, no outcome-conditioned logic:
  * up to `SPARK_GRAFT_BENCH_ROUNDS` (default 2) paired samples of the
  * flagship fit+score pipeline at N=2 and 4N=8 cores, each level in a
  * fresh subprocess JVM, low/high of a pair back-to-back so a slow
  * hypervisor window hits both sides of the ratio; plus one sample at
  * the full thread count for the 8→32 context pair. Reported
  * `scaling_efficiency` = MEDIAN of the per-pair ratios
  * (scoreLow/scoreHigh)/(8/2); every raw sample is emitted in
  * `scaling_samples` so the estimator is inspectable. Samples stop
  * early ONLY on the wall-clock budget (`SPARK_GRAFT_BENCH_BUDGET_SEC`,
  * default 480 s) or per-sample caps (~3× each level's clean-window
  * cost) — never on the measured value; kills are counted in
  * `scaling_sample_failures`, and if no complete pair lands, ONE rescue
  * pair at a third of the input (tagged `scaling_rescue`, row counts on
  * every sample) still evidences the ratio inside any slow window. The N=2→8-core pair is
  * the primary two-cluster-size evidence (the brief allows "N and 4N
  * cores"); on this single box 8→32 threads measures the shared DRAM
  * bus, not the pipeline — the substrate probes bound that and are
  * reported alongside (see BENCH.md).
  */
object Bench {

  private[graft] def session(cpus: Int): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-bench")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // JVM case mapping for lower()/upper(): the ICU path pays a
      // multi-minute CollationAwareUTF8String static init per JVM under
      // thread contention (observed: 32 executor threads parked on the
      // class-init monitor) — unacceptable startup tax at any scale.
      .config("spark.sql.icu.caseMappings.enabled", "false")
      // Disable RPC-backed session-artifact classloader: janino codegen
      // class-resolution misses otherwise round-trip the driver file
      // server per identifier (observed 40s+ stage compiles).
      .config("spark.sql.artifact.isolation.enabled", "false")
      // Shuffle scratch on tmpfs + single-file-per-mapper sort writer:
      // the bypass-merge writer creates maps*reducers tiny files whose
      // open/mmap latency on the virtio disk dominated small shuffles
      // (observed 5s-41s variance on identical jobs).
      .config("spark.local.dir", "/dev/shm/graft-spark")
      .config("spark.shuffle.sort.bypassMergeThreshold", "2")
      .config("spark.file.transferTo", "false")
      .config("spark.io.compression.codec", "lz4")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  /** One full pipeline pass: fit models (constant driver+1 shuffle cost)
    * then the partition-parallel score → dedup-join → threshold →
    * decide phase. Returns (fitSec, scoreSec). */
  private[graft] def pipelineOnce(spark: SparkSession, n: Long, cpus: Int): (Double, Double) = {
    // Fixed partition count at BOTH parallelism levels: identical input
    // layout, only the executor-thread count differs (the N vs 4N
    // evidence must not be confounded by different splits).
    val gen = GenConfig(n = n, parts = 128)
    val images = ImageGen.images(spark, gen).cache()
    images.count() // materialize generation outside the timed window
    val known = ImageGen.knownFaults(spark, gen).select("image_id").count()

    val t0 = System.nanoTime()
    val models = Scorer.fit(spark, images)
    val t1 = System.nanoTime()

    val dupDrop = PhashDup.dropIds(images)
    val scored = Scorer.withScores(images, models, dupDrop)
      .select(col("image_id"), col("invalidity_score"), col("scrubbed_caption"))
      .cache()
    val withStatus = scored.withColumn("status", lit("clean"))
    val (t, _) = Thresholds.discover(withStatus, "invalidity_score", "status", known)
    Scorer.withDecision(scored, t).filter(col("decision") === "drop").count()
    val t2 = System.nanoTime()

    images.unpersist(blocking = true)
    scored.unpersist(blocking = true)
    ((t1 - t0) / 1e9, (t2 - t1) / 1e9)
  }

  /** Warmup + one timed pass at one parallelism level (the per-level
    * measurement body, shared with [[BenchLevel]]). */
  private[graft] def measureLevel(cpus: Int, benchImages: Long): (Double, Double) = {
    val spark = session(cpus)
    pipelineOnce(spark, math.min(benchImages / 10 + 1, 10000L), cpus) // JIT warmup
    val run = pipelineOnce(spark, benchImages, cpus)
    spark.stop()
    run
  }

  private val benchLevelMarker = "BENCHLEVEL"

  /** Run one level in a fresh JVM (clean heap/JIT — sharing one JVM let
    * the first level's GC state skew the second by up to 2×); None if
    * the subprocess can't run or exceeds `timeoutSec`. */
  private def measureLevelSubprocess(cpus: Int, benchImages: Long,
      timeoutSec: Long): Option[(Double, Double)] =
    try {
      val sep = java.io.File.separator
      val javaBin = System.getProperty("java.home") + sep + "bin" + sep + "java"
      val cp = System.getProperty("java.class.path")
      val mem = sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")
      val addOpens = Seq(
        "java.base/java.lang", "java.base/java.lang.invoke",
        "java.base/java.lang.reflect", "java.base/java.io",
        "java.base/java.net", "java.base/java.nio",
        "java.base/java.util", "java.base/java.util.concurrent",
        "java.base/java.util.concurrent.atomic",
        "java.base/sun.nio.ch", "java.base/sun.nio.cs",
        "java.base/sun.security.action", "java.base/sun.util.calendar",
      ).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
      // ParallelGC + pre-touched fixed heap at BOTH levels: measured
      // back-to-back, the throughput collector cut the 32-thread score
      // phase 1.47× vs G1 (13.5 s vs 19.8 s; G1's concurrent cycles
      // compete with 32 mutator threads for cores), and pre-touching
      // keeps first-touch page zeroing out of the timed window.
      val cmd = (Seq(javaBin) ++ addOpens ++ Seq(
        s"-Xms$mem", s"-Xmx$mem", "-XX:+UseParallelGC", "-XX:+AlwaysPreTouch",
        "-Dspark.ui.enabled=false", "-Dspark.sql.session.timeZone=UTC",
        "-cp", cp, "graft.BenchLevel", cpus.toString, benchImages.toString))
      val pb = new ProcessBuilder(cmd: _*)
      val proc = pb.start()
      // drain stderr (Spark logs) so the child never blocks on a full pipe
      val drain = new Thread(() => {
        val s = proc.getErrorStream
        val buf = new Array[Byte](8192)
        while (s.read(buf) >= 0) ()
      })
      drain.setDaemon(true); drain.start()
      // collect stdout on a thread so waitFor(timeout) stays responsive
      val lines = scala.collection.mutable.ArrayBuffer.empty[String]
      val collect = new Thread(() => {
        scala.io.Source.fromInputStream(proc.getInputStream)
          .getLines().foreach(l => lines.synchronized { lines += l })
      })
      collect.setDaemon(true); collect.start()
      val done = proc.waitFor(timeoutSec, java.util.concurrent.TimeUnit.SECONDS)
      if (!done) { proc.destroyForcibly(); None }
      else if (proc.exitValue() != 0) None
      else {
        collect.join(2000)
        lines.synchronized {
          lines.find(_.startsWith(benchLevelMarker + " ")).map { l =>
            val p = l.split(' ')
            (p(1).toDouble, p(2).toDouble)
          }
        }
      }
    } catch { case _: Exception => None }

  private[graft] def levelMain(args: Array[String]): Unit = {
    val (fit, score) = measureLevel(args(0).toInt, args(1).toLong)
    println(s"$benchLevelMarker $fit $score")
  }

  /** Substrate probes (plain threads, no Spark): seconds to complete a
    * FIXED total amount of (a) register-bound hashing and (b) strided
    * DRAM reads at `threads` threads. The ratio probe(n)/probe(4n)
    * bounds what ANY workload can achieve between those thread counts
    * on this box — the context needed to read the two-level pipeline
    * numbers correctly (single-box threads share one memory bus;
    * cluster executors do not). Single run per probe (context, not
    * evidence — the pipeline samples are the evidence). */
  private[graft] def substrateProbe(threads: Int): (Double, Double) = {
    // (a) register-bound: splitmix64 chain, fixed 2e9 total iterations
    val totalIters = 2000000000L
    def cpuRun(): Double = {
      val per = totalIters / threads
      val ts = (0 until threads).map { id =>
        new Thread(() => {
          var x = id.toLong
          var i = 0L
          while (i < per) { x = graft.synth.ImageGen.splitmix64(x); i += 1 }
          if (x == 42L) println("") // sink
        })
      }
      val t0 = System.nanoTime()
      ts.foreach(_.start()); ts.foreach(_.join())
      (System.nanoTime() - t0) / 1e9
    }
    // (b) DRAM-bound: strided reads over per-thread 64 MiB buffers,
    // fixed 8 GiB total traffic
    val bufSz = 64 * 1024 * 1024
    val totalBytes = 8L * 1024 * 1024 * 1024
    def memRun(): Double = {
      val bufs = Array.fill(threads)(new Array[Byte](bufSz))
      val reps = totalBytes / threads / bufSz
      val ts = (0 until threads).map { id =>
        new Thread(() => {
          var s = 0L
          var r = 0L
          while (r < reps) {
            var j = 0
            while (j < bufSz) { s += bufs(id)(j); j += 64 }
            r += 1
          }
          if (s == 42L) println("") // sink
        })
      }
      val t0 = System.nanoTime()
      ts.foreach(_.start()); ts.foreach(_.join())
      (System.nanoTime() - t0) / 1e9
    }
    (cpuRun(), memRun())
  }

  private def median(xs: Seq[Double]): Double = {
    val s = xs.sorted
    val n = s.length
    if (n % 2 == 1) s(n / 2) else (s(n / 2 - 1) + s(n / 2)) / 2.0
  }

  def main(args: Array[String]): Unit = {
    val tStart = System.nanoTime()
    def elapsed: Double = (System.nanoTime() - tStart) / 1e9
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val budgetSec = sys.env.getOrElse("SPARK_GRAFT_BENCH_BUDGET_SEC", "480").toDouble
    def remaining: Double = budgetSec - elapsed
    // Scaling row count: 750k at 32 cpus — large enough that the
    // parallel fraction dominates fixed per-job latency (score ≈ 30 s at
    // 2 cores, ≈ 8 s at 8), small enough that a 2-core sample fits its
    // wall-clock cap even through a ~3× hypervisor slow window.
    val benchImages = sys.env.getOrElse("SPARK_GRAFT_BENCH_IMAGES",
      (cpus * 23438L).toString).toLong

    // Cumulative JSON: ordered field map, re-emitted after every phase /
    // scaling sample. Values are pre-rendered JSON fragments.
    val fields = scala.collection.mutable.LinkedHashMap[String, String](
      "metric" -> "\"total\"", "value" -> "0", "unit" -> "\"sec\"",
      "queries" -> "{}", "sf" -> ("\"" + sfDir + "\""),
      "phase_completed" -> "\"none\"", "budget_sec" -> budgetSec.toString)
    def flush(): Unit = {
      fields("elapsed_sec") = elapsed.toString
      val json = fields.map { case (k, v) => "\"" + k + "\":" + v }
        .mkString("{", ",", "}")
      println(json)
      System.out.flush()
      try {
        java.nio.file.Files.createDirectories(java.nio.file.Paths.get("target"))
        java.nio.file.Files.write(java.nio.file.Paths.get("target/bench.json"),
          json.getBytes("UTF-8")): Unit
      } catch { case _: Throwable => () }
    }

    // --- Phase 1: per-query timings at local[cpus] ---------------------
    // A failing query must NOT bench as fast-and-green: record the error
    // string per query and surface it in the JSON.
    val spark = session(cpus)
    val errors = scala.collection.mutable.LinkedHashMap.empty[String, String]
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch {
        case e: Throwable =>
          errors += name -> s"${e.getClass.getSimpleName}: ${Option(e.getMessage).getOrElse("").take(200)}"
      }
      name -> (System.nanoTime() - t0) / 1e9
    }
    fields("queries") = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    fields("errors") = errors.map { case (k, v) =>
      "\"" + k + "\":\"" + v.replace("\\", "\\\\").replace("\"", "\\\"")
        .replaceAll("[\r\n\t]", " ") + "\""
    }.mkString("{", ",", "}")
    fields("value") = results.map(_._2).sum.toString
    fields("phase_completed") = "\"queries\""
    flush()

    // --- Phase 2: training-data-op throughput (dedup + ANN) ------------
    val dedupN = sys.env.getOrElse("SPARK_GRAFT_BENCH_DEDUP_ROWS", "200000").toLong
    val dedupImages = ImageGen.images(spark,
      GenConfig(n = dedupN, parts = 128)).cache()
    dedupImages.count()
    val tD0 = System.nanoTime()
    graft.ops.Dedup.minhashPairs(dedupImages, "image_id", "caption").count()
    val minhashSec = (System.nanoTime() - tD0) / 1e9
    val tD1 = System.nanoTime()
    graft.ops.Dedup.simhashPairs(dedupImages, "image_id", "caption").count()
    val simhashSec = (System.nanoTime() - tD1) / 1e9
    dedupImages.unpersist(blocking = true)

    val annN = sys.env.getOrElse("SPARK_GRAFT_BENCH_ANN_ROWS", "100000").toLong
    val emb = graft.ops.Similarity.synthEmbeddings(spark, annN).cache()
    emb.count()
    val queries = emb.filter(col("vec_id") < 16)
      .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
    val tA0 = System.nanoTime()
    graft.ops.Similarity.bruteForceTopK(emb, queries, 10).count()
    val annBruteSec = (System.nanoTime() - tA0) / 1e9
    val tA1 = System.nanoTime()
    graft.ops.Similarity.lshTopK(emb, queries, 10, dim = 32).count()
    val annLshSec = (System.nanoTime() - tA1) / 1e9
    emb.unpersist(blocking = true)
    spark.stop()
    PipelineCache.clear()
    fields("dedup_rows") = dedupN.toString
    fields("minhash_docs_per_sec") = (dedupN / minhashSec).toString
    fields("simhash_docs_per_sec") = (dedupN / simhashSec).toString
    fields("ann_rows") = annN.toString
    fields("ann_brute_sec") = annBruteSec.toString
    fields("ann_lsh_sec") = annLshSec.toString
    fields("phase_completed") = "\"dedup_ann\""
    flush()

    // --- Phase 3: two-parallelism scaling (see class doc: protocol is
    // pre-registered; budget — never the measured value — is the only
    // thing that can cut sampling short) -------------------------------
    val maxPairs = math.max(1, sys.env.getOrElse("SPARK_GRAFT_BENCH_ROUNDS", "2").toInt)
    val (nLow, nHigh) = if (cpus >= 16) (2, 8) else (math.max(1, cpus / 4), cpus)
    // (cpus, rows, fitSec, scoreSec) — rows ride along so a rescue pair
    // at a smaller input can never be ratio'd against a primary sample
    final case class Sample(cpus: Int, rows: Long, fit: Double, score: Double)
    val samples = scala.collection.mutable.ArrayBuffer.empty[Sample]
    var samplesFailed = 0
    def renderSamples(): Unit = {
      fields("cpus_low") = nLow.toString
      fields("cpus_high") = nHigh.toString
      fields("cpus_max") = cpus.toString
      fields("pipeline_images") = benchImages.toString
      fields("scaling_samples") = samples.map { s =>
        s"""{"cpus":${s.cpus},"rows":${s.rows},"fit_sec":${s.fit},"score_sec":${s.score}}"""
      }.mkString("[", ",", "]")
      fields("scaling_sample_failures") = samplesFailed.toString
      val lows = samples.filter(_.cpus == nLow)
      val highs = samples.filter(_.cpus == nHigh)
      val maxes = samples.filter(_.cpus == cpus)
      // paired ratios: i-th low with i-th high, same row count only
      val ratios = lows.zip(highs).collect {
        case (lo, hi) if lo.rows == hi.rows =>
          (lo.score / hi.score) / (nHigh.toDouble / nLow)
      }
      fields("scaling_pair_ratios") = ratios.mkString("[", ",", "]")
      if (ratios.nonEmpty) {
        fields("scaling_efficiency") = median(ratios.toSeq).toString
        // summary floors over the row count of the first complete pair
        val n = lows.zip(highs).collectFirst {
          case (lo, hi) if lo.rows == hi.rows => lo.rows }.get
        fields("scaling_rows_used") = n.toString
        val bestLow = lows.filter(_.rows == n).map(_.score).min
        val bestHigh = highs.filter(_.rows == n).map(_.score).min
        fields("score_sec_low") = bestLow.toString
        fields("score_sec_high") = bestHigh.toString
        fields("fit_sec_low") = lows.filter(_.rows == n).map(_.fit).min.toString
        fields("fit_sec_high") = highs.filter(_.rows == n).map(_.fit).min.toString
        fields("images_per_sec_low") = (n / bestLow).toString
        fields("images_per_sec_high") = (n / bestHigh).toString
        maxes.filter(_.rows == n) match {
          case ms if ms.nonEmpty =>
            val bestMax = ms.map(_.score).min
            fields("score_sec_max") = bestMax.toString
            fields("images_per_sec_max") = (n / bestMax).toString
            fields("scaling_efficiency_high_pair") =
              ((bestHigh / bestMax) / (cpus.toDouble / nHigh)).toString
          case _ => ()
        }
      }
    }
    // Returns true iff the sample landed. capSec bounds the child's wall
    // clock; a kill is a FAILURE COUNT, never a retry-until-favorable.
    def sample(c: Int, rows: Long, capSec: Long): Boolean = {
      val cap = math.max(45L, math.min(remaining.toLong - 10L, capSec))
      val got = measureLevelSubprocess(c, rows, cap)
      got.foreach(r => samples += Sample(c, rows, r._1, r._2))
      if (got.isEmpty) samplesFailed += 1
      renderSamples()
      flush()
      got.nonEmpty
    }
    // Per-sample caps sized at ~3× the clean-window cost of each level so
    // one hypervisor slow window can't drain the whole phase budget
    // (clean floors at 750k rows: 2c ≈ 75 s, 8c ≈ 30 s, 32c ≈ 25 s
    // including JVM+session startup and warmup).
    val capLow = 240L; val capHigh = 120L; val capMax = 90L
    var pairCost = Double.MaxValue
    for (p <- 0 until maxPairs) {
      val canRun =
        if (p == 0) remaining > 90 // always try one pair if any time is left
        else remaining > math.min(pairCost * 1.2, (capLow + capHigh).toDouble)
      if (canRun) {
        val t0 = elapsed
        sample(nLow, benchImages, capLow)
        sample(nHigh, benchImages, capHigh)
        pairCost = math.min(pairCost, elapsed - t0)
        // the 8→32 context sample rides after the first pair
        if (p == 0 && cpus > nHigh && remaining > 120) sample(cpus, benchImages, capMax)
      }
    }
    // Rescue pair: if NO complete pair landed (both-sides-killed in a slow
    // window — a completion condition, not a value condition), one pair at
    // a third of the input still evidences the ratio and fits any window.
    val havePair = samples.exists(_.cpus == nLow) && samples.exists(_.cpus == nHigh)
    if (!havePair && remaining > 120) {
      fields("scaling_rescue") = "true"
      val rescueRows = math.max(100000L, benchImages / 3)
      sample(nLow, rescueRows, capLow)
      sample(nHigh, rescueRows, capHigh)
    }
    // Last resort: subprocess spawn itself unavailable under this
    // launcher → one in-process pair, tagged (in-sbt absolute times run
    // slower than a clean child JVM; the ratio is still informative).
    if (samples.isEmpty && remaining > 90) {
      fields("scaling_mode") = "\"inproc_fallback\""
      try {
        val lo = measureLevel(nLow, benchImages)
        samples += Sample(nLow, benchImages, lo._1, lo._2); renderSamples(); flush()
        val hi = measureLevel(nHigh, benchImages)
        samples += Sample(nHigh, benchImages, hi._1, hi._2); renderSamples(); flush()
      } catch { case _: Throwable => () }
    } else fields("scaling_mode") = "\"subprocess\""
    fields("scaling_pairs_run") = samples.count(_.cpus == nLow).toString
    fields("phase_completed") = "\"scaling\""
    flush()

    // --- Phase 4 (context only): substrate probes for the 8→32 pair ----
    if (cpus > nHigh && remaining > 45) {
      val (cpuProbeHigh, memProbeHigh) = substrateProbe(nHigh)
      val (cpuProbeMax, memProbeMax) = substrateProbe(cpus)
      fields("probe_cpu_scaling_high_to_max") = (cpuProbeHigh / cpuProbeMax).toString
      fields("probe_mem_scaling_high_to_max") = (memProbeHigh / memProbeMax).toString
      fields("phase_completed") = "\"probes\""
      flush()
    }
  }
}

/** Subprocess entry for one parallelism level (see [[Bench]] class doc):
  * prints "BENCHLEVEL <fitSec> <scoreSec>" on stdout. */
object BenchLevel {
  def main(args: Array[String]): Unit = Bench.levelMain(args)
}
