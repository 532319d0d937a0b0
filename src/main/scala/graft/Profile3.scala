package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.models.NGramLM
import graft.synth.{GenConfig, ImageGen}
object Profile3 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
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
    val gen = GenConfig(n = 200000L, parts = 128)
    val images = ImageGen.images(spark, gen).cache()
    images.count()
    for (i <- 1 to 6) {
      val t0 = System.nanoTime()
      NGramLM.fit(spark, images.select(col("caption")).as[String])
      println(f"[p3] lm fit $i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
