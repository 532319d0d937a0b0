package graft

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}
import graft.scrub.Scrub

class ScrubSpec extends AnyFunSuite {
  lazy val spark = GraftTestSpark.spark
  import spark.implicits._

  private def scrubSpark(s: String): String =
    Seq(s).toDF("caption").select(Scrub.scrub(col("caption"))).head().getString(0)

  test("email is scrubbed") {
    assert(scrubSpark("contact user42@example.com now") == "contact <EMAIL> now")
  }

  test("ssn is scrubbed") {
    assert(scrubSpark("ssn 123-45-6789 here") == "ssn <SSN> here")
  }

  test("phone is scrubbed") {
    assert(scrubSpark("call 555-123-4567 today") == "call <PHONE> today")
  }

  test("ip and url are scrubbed") {
    assert(scrubSpark("at 192.168.1.1 via https://x.example/z q") == "at <IP> via <URL> q")
  }

  test("clean text unchanged") {
    val s = "a photo of a dog running on the beach"
    assert(scrubSpark(s) == s)
  }

  test("spark expression matches driver-side scrubString") {
    val samples = Seq(
      "mail a@b.co or b@c.org", "555-123-4567 and 123-45-6789",
      "nothing here", "mixed a@b.co text 10.0.0.1 end")
    samples.foreach(s => assert(scrubSpark(s) == Scrub.scrubString(s)))
  }

  test("scrub is idempotent (property)") {
    val wordGen = Gen.oneOf("dog", "cat", "user7@example.com", "555-123-4567",
      "123-45-6789", "10.0.0.1", "https://a.b/c", "plain", "x")
    val textGen = Gen.listOf(wordGen).map(_.mkString(" "))
    val prop = Prop.forAll(textGen) { t =>
      val once = Scrub.scrubString(t)
      Scrub.scrubString(once) == once
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(res.passed, res.status.toString)
  }

  test("replacement tokens never match any pattern") {
    val tokens = Scrub.rules.map(_._3).mkString(" ")
    assert(Scrub.scrubString(tokens) == tokens)
  }
}
