package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.synth.{GenConfig, ImageGen}

class GenSpec extends AnyFunSuite {
  lazy val spark = GraftTestSpark.spark

  val cfg = GenConfig(n = 1000L)

  test("generation is deterministic (pure in id)") {
    val a = ImageGen.rowFor(cfg, 123L)
    val b = ImageGen.rowFor(cfg, 123L)
    assert(a._1 == b._1.copy(bytes = a._1.bytes) && a._2 == b._2 && a._3 == b._3)
    val df1 = ImageGen.images(spark, cfg).collect().sortBy(_.getString(0))
    val df2 = ImageGen.images(spark, cfg).collect().sortBy(_.getString(0))
    assert(df1.map(_.getString(5)).sameElements(df2.map(_.getString(5))))
  }

  test("fault fraction is ~faultPct%") {
    val kf = ImageGen.knownFaults(spark, cfg).count()
    assert(kf > 20 && kf < 100, s"known faults = $kf")
  }

  test("every fault class appears") {
    val classes = ImageGen.knownFaults(spark, cfg)
      .select("fault_class").distinct().collect().map(_.getString(0)).toSet
    ImageGen.faultClasses.filterNot(_ == "near_duplicate").foreach { fc =>
      assert(classes.contains(fc), s"missing class $fc")
    }
  }

  test("near-duplicate base is always a smaller clean id") {
    (32L until 5000L).foreach { id =>
      if (ImageGen.faultClass(cfg.seed, cfg.faultPct, id) == "near_duplicate") {
        val base = ImageGen.dupBaseId(cfg.seed, cfg.faultPct, id)
        assert(base < id)
        assert(ImageGen.faultClass(cfg.seed, cfg.faultPct, base) == null)
      }
    }
  }

  test("near-duplicate phash within hamming 4 of base") {
    (32L until 5000L).foreach { id =>
      if (ImageGen.faultClass(cfg.seed, cfg.faultPct, id) == "near_duplicate") {
        val base = ImageGen.dupBaseId(cfg.seed, cfg.faultPct, id)
        val (row, _, _) = ImageGen.rowFor(cfg, id)
        val ham = java.lang.Long.bitCount(row.phash ^ ImageGen.cleanPhash(cfg.seed, base))
        assert(ham >= 1 && ham <= 4, s"id=$id hamming=$ham")
      }
    }
  }

  test("image bytes decode and are bit-exact through the pipeline (PSNR gate)") {
    val withBytes = cfg.copy(n = 50L, withBytes = true)
    val rows = ImageGen.images(spark, withBytes).collect()
    rows.foreach { r =>
      val bytes = r.getAs[Array[Byte]]("bytes")
      assert(bytes != null && bytes.nonEmpty)
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      assert(img != null && img.getWidth == 16 && img.getHeight == 16)
    }
    // bytes pass through the engine unmodified => decoded pixels identical
    // (PSNR = ∞ ≥ 40 dB); assert byte identity after a select round-trip.
    val out = ImageGen.images(spark, withBytes).select("image_id", "bytes").collect()
      .map(r => r.getString(0) -> r.getAs[Array[Byte]](1)).toMap
    rows.foreach { r =>
      assert(java.util.Arrays.equals(out(r.getString(0)), r.getAs[Array[Byte]]("bytes")))
    }
  }

  test("expected decisions: drop iff faulty") {
    val exp = ImageGen.expected(spark, cfg).collect()
    exp.foreach { r =>
      val fc = r.getAs[String]("fault_class")
      val dec = r.getAs[String]("decision")
      assert(if (fc == "") dec == "keep" else dec == "drop")
    }
  }
}
