package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.detect.Scorer
import graft.discovery.{PhashDup, Thresholds}
import graft.models.{LangId, NGramLM}
import graft.synth.{GenConfig, ImageGen}

/** Phase-by-phase wall-clock breakdown of the flagship pipeline — dev
  * tool for finding the serial bottleneck (not part of the driver
  * contract). */
object Profile {
  def main(args: Array[String]): Unit = {
    val n = sys.env.getOrElse("SPARK_GRAFT_BENCH_IMAGES", "200000").toLong
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.icu.caseMappings.enabled", "false")
      // Disable RPC-backed session-artifact classloader: janino codegen
      // class-resolution misses otherwise round-trip the driver file
      // server per identifier (observed 40s+ stage compiles).
      .config("spark.sql.artifact.isolation.enabled", "false")
      // Shuffle scratch on tmpfs + single-file-per-mapper sort writer:
      // the bypass-merge writer creates maps*reducers tiny files whose
      // open/mmap latency on the virtio disk dominated small shuffles
      // (observed 5s-41s variance on identical jobs). Per-process subdir
      // so a killed JVM's leak is reapable (Scratch.cleanupOrphans).
      .config("spark.local.dir", graft.engine.Scratch.localDir("profile"))
      .config("spark.shuffle.sort.bypassMergeThreshold", "2")
      .config("spark.file.transferTo", "false")
      .config("spark.io.compression.codec", "lz4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def timed[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[profile] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    val gen = GenConfig(n = n, parts = 128)
    val images = timed("generate+cache") {
      val df = ImageGen.images(spark, gen).cache(); df.count(); df
    }
    timed("langid train (driver)") { LangId.pretrained }
    val lm = timed("lm fit (distributed)") {
      NGramLM.fit(spark, images.select(col("caption")).as[String])
    }
    println(s"[profile] lm table size = ${lm.size}")
    val models = timed("full Scorer.fit") { Scorer.fit(spark, images) }
    val dupDrop = timed("phash dup ids") {
      val d = PhashDup.dropIds(images).cache(); d.count(); d
    }
    val scored = timed("score pass (cache count)") {
      val s = Scorer.withScores(images, models, dupDrop)
        .select(col("image_id"), col("invalidity_score"), col("scrubbed_caption"))
        .cache()
      s.count(); s
    }
    val t = timed("threshold (approx sketch)") {
      Thresholds.discover(scored.withColumn("status", lit("clean")),
        "invalidity_score", "status", n / 20, n)._1
    }
    timed("decide+count") {
      Scorer.withDecision(scored, t).filter(col("decision") === "drop").count()
    }
    // isolate scoring subexpressions
    timed("udf-only pass") {
      val qUdf = udf((s: String) => {
        val acc = models.langId.value.acceptedProb(s)
        val ppl = models.lm.value.perplexity(s)
        acc + ppl
      })
      images.select(sum(qUdf(col("caption")))).head()
    }
    timed("rules-only pass") {
      images.select(Scorer.ruleColumns.map(_._2.as("c")).reduce(_ + _).as("s"))
        .agg(sum("s")).head()
    }
    timed("scrub-only pass") {
      images.select(length(graft.scrub.Scrub.scrub(col("caption"))).as("l"))
        .agg(sum("l")).head()
    }
    spark.stop()
  }
}
