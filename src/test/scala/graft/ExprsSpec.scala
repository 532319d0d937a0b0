package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.Exprs
import org.scalatest.funsuite.AnyFunSuite
import graft.models.{LangId, NGramLM}

/** Native Catalyst expression tier: A/B parity vs direct model calls,
  * null handling, codegen participation, SQL registration. */
class ExprsSpec extends AnyFunSuite {
  lazy val spark = GraftTestSpark.spark
  import spark.implicits._

  lazy val langIdB = spark.sparkContext.broadcast(LangId.pretrained)
  lazy val lmB = {
    val corpus = LangId.trainingCorpus().map(_._2)
    spark.sparkContext.broadcast(NGramLM.fit(spark, spark.createDataset(corpus)))
  }

  val samples = Seq(
    "a photo of a dog running on the beach at sunset",
    "le chien qui court sur la plage",
    "sobaka begushchaya plyazh zakat",
    "xqzvk pwxjq brtnk zzvwq",
    "")

  test("expression values match direct model calls (A/B parity)") {
    val df = samples.toDF("caption")
    val rows = df.select(
      col("caption"),
      Exprs.langidAcceptedProb(col("caption"), langIdB).as("acc"),
      Exprs.langidBest(col("caption"), langIdB).as("lang"),
      Exprs.perplexity(col("caption"), lmB).as("ppl")).collect()
    rows.foreach { r =>
      val c = r.getString(0)
      assert(r.getDouble(1) == LangId.pretrained.acceptedProb(c))
      assert(r.getString(2) == LangId.pretrained.bestLang(c)._1)
      assert(r.getDouble(3) == lmB.value.perplexity(c))
    }
  }

  test("null input yields null output (UnaryExpression null semantics)") {
    val df = Seq[(String, Int)]((null, 1)).toDF("caption", "x")
    val r = df.select(Exprs.langidAcceptedProb(col("caption"), langIdB)).head()
    assert(r.isNullAt(0))
  }

  test("expressions run inside whole-stage codegen") {
    val df = spark.range(100).selectExpr("cast(id as string) as caption")
      .select(Exprs.perplexity(col("caption"), lmB).as("p"))
      .filter(col("p") > 0)
    val plan = df.queryExecution.executedPlan.toString()
    // "*(n)" marks operators inside WholeStageCodegen stage n; the
    // Project/Filter containing our expression must carry it
    assert(plan.linesIterator.exists(l =>
      l.contains("*(") && l.contains("graft_perplexity")), plan)
    assert(df.count() == 100)
  }

  test("hamming64: symmetry, bounds, parity with bit_count") {
    val df = Seq((0L, -1L), (5L, 5L), (0x0fL, 0x01L)).toDF("a", "b")
    val rows = df.select(
      Exprs.hamming64(col("a"), col("b")).as("h1"),
      bit_count(col("a").bitwiseXOR(col("b"))).cast("long").as("h2"),
      Exprs.hamming64(col("b"), col("a")).as("h3")).collect()
    rows.foreach { r =>
      assert(r.getLong(0) == r.getLong(1))
      assert(r.getLong(0) == r.getLong(2))
      assert(r.getLong(0) >= 0 && r.getLong(0) <= 64)
    }
  }

  test("simhash64 / minhash band-key expressions: scalar parity + null + codegen") {
    val texts = Seq("a photo of a dog on the beach",
      "the same words the same words the same words", "")
    val df = texts.toDF("t")
    val rows = df.select(col("t"),
      Exprs.simhash64(col("t")).as("sh"),
      Exprs.minhashBandKeys(col("t"), 3, 64, 16).as("mk")).collect()
    rows.foreach { r =>
      assert(r.getLong(1) == graft.ops.Dedup.simhash64(r.getString(0)))
      assert(r.getSeq[Long](2) ==
        graft.ops.Dedup.minhashBandKeys(r.getString(0), 3, 64, 16).toSeq)
    }
    val nullRow = Seq[(String, Int)]((null, 1)).toDF("t", "x")
      .select(Exprs.simhash64(col("t")), Exprs.minhashBandKeys(col("t"), 3, 64, 16))
      .head()
    assert(nullRow.isNullAt(0) && nullRow.isNullAt(1))
    // local Seq relations constant-fold away (ConvertToLocalRelation);
    // a range source keeps the expression in a codegen'd Project
    val plan = spark.range(10).selectExpr("cast(id as string) as t")
      .select(Exprs.simhash64(col("t")).as("s"))
      .filter(col("s") =!= 0L).queryExecution.executedPlan.toString()
    assert(plan.linesIterator.exists(l =>
      l.contains("*(") && l.contains("graft_simhash64")), plan)
  }

  test("hyperplane signature expression: scalar parity + null + codegen") {
    val planes = graft.ops.Similarity.hyperplanes(dim = 8, nPlanes = 10, seed = 7L)
    val vecs = Seq(
      Array(1f, -2f, 0.5f, 3f, -1f, 0f, 2f, -0.25f),
      Array.fill(8)(0f),
      Array.tabulate(8)(i => (i - 4).toFloat))
    val df = vecs.zipWithIndex.map { case (v, i) => (i, v) }.toDF("i", "v")
    val rows = df.select(col("i"), Exprs.hyperplaneSig(col("v"), planes).as("sig"))
      .collect()
    rows.foreach { r =>
      assert(r.getInt(1) ==
        graft.ops.Similarity.signatureOf(vecs(r.getInt(0)), planes))
    }
    val nullRow = Seq[(Array[Float], Int)]((null, 1)).toDF("v", "x")
      .select(Exprs.hyperplaneSig(col("v"), planes)).head()
    assert(nullRow.isNullAt(0))
    // stays inside whole-stage codegen (the former UDF here was the one
    // serde boundary left in the ANN hot path)
    val plan = spark.range(10)
      .select(org.apache.spark.sql.functions.array(
        (0 until 8).map(i => (col("id") + i).cast("float")): _*).as("v"))
      .select(Exprs.hyperplaneSig(col("v"), planes).as("s"))
      .filter(col("s") >= 0).queryExecution.executedPlan.toString()
    assert(plan.linesIterator.exists(l =>
      l.contains("*(") && l.contains("graft_hyperplane_sig")), plan)
  }

  test("pplRef expression: exact parity with the map-literal coalesce chain") {
    // r6 gate: Scorer.pplScoreCol's reference lookup moved from
    // coalesce(element_at(<map literal>, lang), lit(global)) to the
    // native Exprs.PplRef — identical doubles on hits, misses, NULL
    // language, and the empty-map fallback.
    import spark.implicits._
    val byLang = Map("en" -> 4.25, "fr" -> 7.5, "zh" -> 11.125)
    val langs = Seq("en", "fr", "zh", "de", "und", null, "")
      .map(Tuple1(_)).toDF("lang")
    val cmp = langs.select(
      Exprs.pplRef(col("lang"), byLang, 5.75).as("nat"),
      graft.detect.Scorer.pplRefColCatalyst(col("lang"), byLang, 5.75).as("cat"))
    assert(cmp.filter(not(col("nat") <=> col("cat"))).count() == 0L)
    val cmpEmpty = langs.select(
      Exprs.pplRef(col("lang"), Map.empty[String, Double], 2.5).as("nat"),
      graft.detect.Scorer.pplRefColCatalyst(
        col("lang"), Map.empty[String, Double], 2.5).as("cat"))
    assert(cmpEmpty.filter(not(col("nat") <=> col("cat"))).count() == 0L)
    // and inside whole-stage codegen (no fallback to interpreted mode);
    // a range-based source so ConvertToLocalRelation can't pre-evaluate
    val ranged = spark.range(10).select(
      when(col("id") % 2 === 0, lit("en")).otherwise(lit("xx")).as("lang"))
    val plan = ranged.select(Exprs.pplRef(col("lang"), byLang, 5.75).as("r"))
      .queryExecution.executedPlan.toString
    // "*(n)" marks operators inside WholeStageCodegen stage n
    assert(plan.linesIterator.exists(l =>
      l.contains("*(") && l.contains("graft_ppl_ref")), plan)
    val vals = ranged.select(Exprs.pplRef(col("lang"), byLang, 5.75).as("r"))
      .collect().map(_.getDouble(0)).toSet
    assert(vals == Set(4.25, 5.75))
  }

  test("graft_scrub: exact parity with the regexp_replace chain") {
    val texts = Seq(
      "contact me at user9@example.com or 555-123-4567 now",
      "visit https://a.example/x?y=1 from 10.0.0.1",
      "my ssn is 123-45-6789 you unclefucker",
      "a perfectly clean caption about a dog",
      "")
    val df = texts.toDF("caption")
    val rows = df.select(col("caption"),
      Exprs.scrubAll(col("caption")).as("fast"),
      graft.scrub.Scrub.scrub(col("caption")).as("chain")).collect()
    rows.foreach { r =>
      assert(r.getString(1) == r.getString(2), s"mismatch on '${r.getString(0)}'")
      assert(r.getString(1) == graft.scrub.Scrub.scrubString(r.getString(0)))
    }
    val nullRow = Seq[(String, Int)]((null, 1)).toDF("caption", "x")
      .select(Exprs.scrubAll(col("caption"))).head()
    assert(nullRow.isNullAt(0))
  }

  test("nearest-centroid expression: scalar parity + null + codegen") {
    val centroids = Array(
      Array(1.0, 0.0, 0.0), Array(0.0, 1.0, 0.0), Array(-1.0, -1.0, 0.0))
    val halfNorms = centroids.map(c => c.map(x => x * x).sum / 2.0)
    val vecs = Seq(
      Array(0.9f, 0.1f, 0f), Array(0.1f, 2.0f, 0f), Array(-3f, -3f, 0f))
    val df = vecs.zipWithIndex.map { case (v, i) => (i, v) }.toDF("i", "v")
    val rows = df.select(col("i"),
      Exprs.nearestCentroid(col("v"), centroids, halfNorms).as("c")).collect()
    rows.foreach { r =>
      assert(r.getInt(1) == graft.ops.Similarity.nearestCentroid(
        vecs(r.getInt(0)), centroids, halfNorms))
    }
    assert(rows.sortBy(_.getInt(0)).map(_.getInt(1)).toSeq == Seq(0, 1, 2))
    val nullRow = Seq[(Array[Float], Int)]((null, 1)).toDF("v", "x")
      .select(Exprs.nearestCentroid(col("v"), centroids, halfNorms)).head()
    assert(nullRow.isNullAt(0))
    val plan = spark.range(10)
      .select(org.apache.spark.sql.functions.array(
        (0 until 3).map(i => (col("id") + i).cast("float")): _*).as("v"))
      .select(Exprs.nearestCentroid(col("v"), centroids, halfNorms).as("c"))
      .filter(col("c") >= 0).queryExecution.executedPlan.toString()
    assert(plan.linesIterator.exists(l =>
      l.contains("*(") && l.contains("graft_nearest_centroid")), plan)
  }

  test("GraftExtensions: injector applies cleanly and its builders evaluate") {
    // apply() must register every function without throwing (the
    // spark-submit path: --conf spark.sql.extensions=graft.GraftExtensions)
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new GraftExtensions().apply(ext)
    // a second session with different extensions can't be built in a
    // shared-JVM test; drive the SAME (name, builder) triples through
    // the live session's registry and assert SQL-level parity
    GraftExtensions.functions.foreach { case (name, _, builder) =>
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        name + "_ext", builder, "scala_udf")
    }
    val r = spark.sql(
      """SELECT hamming64_ext(15L, 1L) AS h,
        |  graft_simhash64_ext('a photo of a dog') AS sh,
        |  graft_scrub_ext('mail user9@example.com now') AS sc,
        |  size(graft_minhash_bands_ext('a b c d e', 3, 64, 16)) AS nb
        |""".stripMargin).head()
    assert(r.getLong(0) == 3L)
    assert(r.getLong(1) == graft.ops.Dedup.simhash64("a photo of a dog"))
    assert(r.getString(2) == graft.scrub.Scrub.scrubString("mail user9@example.com now"))
    assert(r.getInt(3) == 16)
  }

  test("SQL registration: functions callable from spark.sql") {
    Exprs.registerSql(spark, langIdB, lmB)
    val out = spark.sql(
      """SELECT hamming64(15L, 1L) AS h,
        |  graft_langid('le chien court sur la plage') AS l,
        |  graft_accepted_prob('a photo of the dog') > 0.5 AS acc_ok,
        |  graft_perplexity('xqzvk pwxjq brtnk') > 0 AS ppl_ok""".stripMargin).head()
    assert(out.getLong(0) == 3L)
    assert(out.getString(1) == "fr")
    assert(out.getBoolean(2) && out.getBoolean(3))
  }
}
