package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.models.NGramLM
import graft.synth.{GenConfig, ImageGen}
import graft.detect.Scorer
import graft.discovery.PhashDup

/** Finer-grained profile (dev tool). */
object Profile2 {
  def main(args: Array[String]): Unit = {
    val n = sys.env.getOrElse("SPARK_GRAFT_BENCH_IMAGES", "200000").toLong
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.icu.caseMappings.enabled", "false")
      .config("spark.sql.artifact.isolation.enabled", "false")
      // Shuffle scratch on tmpfs + single-file-per-mapper sort writer:
      // the bypass-merge writer creates maps*reducers tiny files whose
      // open/mmap latency on the virtio disk dominated small shuffles
      // (observed 5s-41s variance on identical jobs).
      .config("spark.local.dir", "/dev/shm/graft-spark")
      .config("spark.shuffle.sort.bypassMergeThreshold", "2")
      .config("spark.file.transferTo", "false")
      .config("spark.io.compression.codec", "lz4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    def timed[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[p2] $name%-30s ${(System.nanoTime() - t0) / 1e9}%8.2f s"); r
    }
    val gen = GenConfig(n = n, parts = 128)
    val images = timed("generate+cache") { val df = ImageGen.images(spark, gen).cache(); df.count(); df }
    timed("scan cached captions") { images.select(length(col("caption")).as("l")).agg(sum("l")).head() }
    timed("lm fit 1") { NGramLM.fit(spark, images.select(col("caption")).as[String]) }
    timed("lm fit 2") { NGramLM.fit(spark, images.select(col("caption")).as[String]) }
    val models = timed("Scorer.fit full") { Scorer.fit(spark, images) }
    timed("perlang quantile only") {
      val lmB = models.lm; val liB = models.langId
      val qUdf = udf((s: String) => (lmB.value.perplexity(s), liB.value.bestLang(s)._1))
      images.select(qUdf(col("caption")).as("q"))
        .select(col("q._1").as("ppl"), col("q._2").as("lang"))
        .groupBy("lang").agg(expr("percentile_approx(ppl, 0.5D, 10000)")).collect()
    }
    timed("phash dup 1") { PhashDup.dropIds(images).count() }
    timed("phash dup 2") { PhashDup.dropIds(images).count() }
    timed("banded explode only") {
      images.select(col("image_id"), col("phash")).count()
    }
    spark.stop()
  }
}
