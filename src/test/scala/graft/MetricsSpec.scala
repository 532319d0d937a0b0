package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.eval.Metrics

/** Exact-fraction parity with /root/reference/backendClasses/
  * Evaluation.py:6-38 and DQTestToolHelper.py:211-238. */
class MetricsSpec extends AnyFunSuite {

  test("PD = |E∩A|/|E|, 0 when E empty") {
    assert(Metrics.previouslyDetected(10, 7) == 0.7)
    assert(Metrics.previouslyDetected(0, 0) == 0.0)
  }

  test("UD = |E−A|/|E|, 1 when E empty") {
    assert(Metrics.undetected(10, 3) == 0.3)
    assert(Metrics.undetected(0, 0) == 1.0)
  }

  test("SD/ND = |TF−E|/|A|") {
    assert(Metrics.newlyDetected(20, 5) == 0.25)
    assert(Metrics.newlyDetected(0, 0) == 0.0)
  }

  test("TPR = |AF|/|faulty|") {
    assert(Metrics.truePositiveRate(8, 10) == 0.8)
    assert(Metrics.truePositiveRate(0, 10) == 0.0)
  }

  test("FNR = |AFold−AFnew|/|AFold|, 0 when no old") {
    assert(Metrics.falseNegativeRate(2, 8) == 0.25)
    assert(Metrics.falseNegativeRate(0, 0) == 0.0)
  }

  test("TPGR = (last/first)^(1/NR) − 1") {
    val tprs = Seq(0.5, 0.6, 0.8)
    val expected = math.pow(0.8 / 0.5, 1.0 / 3.0) - 1.0
    assert(math.abs(Metrics.truePositiveGrowthRate(tprs) - expected) < 1e-12)
  }

  test("F1") {
    assert(Metrics.f1(90, 10, 10) == 0.9)
    assert(Metrics.f1(0, 0, 0) == 0.0)
  }
}
