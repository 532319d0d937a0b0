package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.detect.Scorer
import graft.discovery.{PhashDup, Thresholds}
import graft.synth.{GenConfig, ImageGen}

/** Benchmark main. Prints exactly ONE JSON line:
  * {"metric":"total","value":<sec>,"unit":"sec","queries":{...},"sf":...}
  * plus flagship-pipeline throughput (images/sec) measured at TWO
  * parallelism levels (local[N] vs local[4N] on identical input) and the
  * resulting scaling efficiency — the sandbox evidence for the
  * BASELINE.json two-cluster-size criterion.
  *
  * SPARK_GRAFT_CPUS sets the high level (default 32); low = max(1, N/4).
  * SPARK_GRAFT_BENCH_IMAGES sets the synthetic pipeline row count.
  *
  * Each parallelism level runs in a FRESH subprocess JVM
  * ([[BenchLevel]]): with both levels in one JVM, the second session
  * inherits the first's heap fragmentation / GC state and its score
  * phase was observed to swing 2× between otherwise identical runs —
  * exactly the noise the efficiency ratio must not contain. Falls back
  * to in-process measurement if spawning fails.
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

  /** Warmup + `passes` timed passes at one parallelism level, min taken
    * (the per-level measurement body, shared with [[BenchLevel]]). */
  private[graft] def measureLevel(cpus: Int, benchImages: Long,
      passes: Int = 1): (Double, Double) = {
    val spark = session(cpus)
    pipelineOnce(spark, math.min(benchImages / 10 + 1, 20000L), cpus) // warmup
    val runs = (1 to math.max(1, passes)).map(_ => pipelineOnce(spark, benchImages, cpus))
    spark.stop()
    (runs.map(_._1).min, runs.map(_._2).min)
  }

  private val benchLevelMarker = "BENCHLEVEL"

  /** Run one level in a fresh JVM; None if the subprocess can't run. */
  private def measureLevelSubprocess(cpus: Int, benchImages: Long): Option[(Double, Double)] =
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
      val cmd = (Seq(javaBin) ++ addOpens ++ Seq(
        s"-Xms$mem", s"-Xmx$mem",
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
      val lines = scala.io.Source.fromInputStream(proc.getInputStream).getLines().toList
      val rc = proc.waitFor()
      if (rc != 0) None
      else lines.find(_.startsWith(benchLevelMarker + " ")).map { l =>
        val p = l.split(' ')
        (p(1).toDouble, p(2).toDouble)
      }
    } catch { case _: Exception => None }

  private[graft] def levelMain(args: Array[String]): Unit = {
    val (fit, score) = measureLevel(args(0).toInt, args(1).toLong)
    println(s"$benchLevelMarker $fit $score")
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    // Default scales with the CPU budget so the parallel fraction
    // dominates fixed per-job latency at any level (≈62k rows/core).
    val benchImages = sys.env.getOrElse("SPARK_GRAFT_BENCH_IMAGES",
      (cpus * 62500L).toString).toLong
    val lowCpus = math.max(1, cpus / 4)

    // --- Phases 1-2: pipeline throughput per level. Each sample runs in
    // its OWN JVM (clean heap/JIT), and the levels are INTERLEAVED
    // L,H,L,H across time with the per-side minimum taken: this VM's
    // hypervisor noise comes in multi-minute windows that hit the
    // 32-thread side hardest (observed 14–27 s for the identical score
    // phase across runs while the 8-thread side held within ±3%); the
    // min over temporally-spread samples estimates each side's noise
    // floor — the quantity the N-vs-4N criterion is about.
    val rounds = sys.env.getOrElse("SPARK_GRAFT_BENCH_ROUNDS", "2").toInt
    val samples = (1 to math.max(1, rounds)).map { _ =>
      val lo = measureLevelSubprocess(lowCpus, benchImages)
        .getOrElse(measureLevel(lowCpus, benchImages))
      val hi = measureLevelSubprocess(cpus, benchImages)
        .getOrElse(measureLevel(cpus, benchImages))
      (lo, hi)
    }
    val fitLow = samples.map(_._1._1).min
    val scoreLow = samples.map(_._1._2).min
    val fitHigh = samples.map(_._2._1).min
    val scoreHigh = samples.map(_._2._2).min
    PipelineCache.clear()

    // --- Phases 3-4 session (per-query timings + dedup/ANN throughput)
    val spark = session(cpus)

    // --- Phase 3: per-query timings at local[cpus] ---------------------
    // A failing query must NOT bench as fast-and-green: record the error
    // string per query and surface it in the JSON.
    val errors = scala.collection.mutable.LinkedHashMap.empty[String, String]
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch {
        case e: Throwable =>
          errors += name -> s"${e.getClass.getSimpleName}: ${Option(e.getMessage).getOrElse("").take(200)}"
      }
      name -> (System.nanoTime() - t0) / 1e9
    }

    // --- Phase 4: training-data-op throughput (dedup + ANN) ------------
    val dedupN = math.max(benchImages / 5, 10000L)
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

    val annN = math.max(benchImages / 10, 10000L)
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

    val ipsHigh = benchImages / scoreHigh
    val ipsLow = benchImages / scoreLow
    val eff = (ipsHigh / ipsLow) / (cpus.toDouble / lowCpus)

    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val errJson = errors.map { case (k, v) =>
      "\"" + k + "\":\"" + v.replace("\\", "\\\\").replace("\"", "\\\"")
        .replaceAll("[\r\n\t]", " ") + "\""
    }.mkString("{", ",", "}")
    val total = results.map(_._2).sum
    val json =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir",""" +
        s""""errors":$errJson,""" +
        s""""pipeline_images":$benchImages,""" +
        s""""cpus_high":$cpus,"cpus_low":$lowCpus,""" +
        s""""fit_sec_high":$fitHigh,"fit_sec_low":$fitLow,""" +
        s""""score_sec_high":$scoreHigh,"score_sec_low":$scoreLow,""" +
        s""""images_per_sec_high":$ipsHigh,"images_per_sec_low":$ipsLow,""" +
        s""""scaling_efficiency":$eff,""" +
        s""""dedup_rows":$dedupN,"minhash_docs_per_sec":${dedupN / minhashSec},""" +
        s""""simhash_docs_per_sec":${dedupN / simhashSec},""" +
        s""""ann_rows":$annN,"ann_brute_sec":$annBruteSec,"ann_lsh_sec":$annLshSec}"""
    println(json)
    // Belt-and-braces for the harness: also persist the line to a file so
    // a log-prefix regression can never make the round unparseable again.
    try {
      java.nio.file.Files.write(java.nio.file.Paths.get("target/bench.json"),
        json.getBytes("UTF-8")): Unit
    } catch { case _: Throwable => () }
  }
}

/** Subprocess entry for one parallelism level (see [[Bench]] class doc):
  * prints "BENCHLEVEL <fitSec> <scoreSec>" on stdout. */
object BenchLevel {
  def main(args: Array[String]): Unit = Bench.levelMain(args)
}
