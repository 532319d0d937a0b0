package graft

import org.scalatest.funsuite.AnyFunSuite

/** The scaling-pair floor estimator is the one piece of Bench whose
  * value reaches the driver artifact's gate key (`scaling_efficiency`),
  * so its asymmetry rule is pinned here: extra low-side passes may only
  * LOWER the reported efficiency, extra high-side passes are discarded.
  */
class BenchSpec extends AnyFunSuite {

  private def eff(low: Double, high: Double, coreRatio: Double = 4.0) =
    (low / high) / coreRatio

  test("run-14 shape: low banked 2 passes, high self-budgeted to 1 — " +
      "the low floor uses the later clean pass, not the coldest") {
    val (lo, hi) = Bench.scalingFloors(Seq(26.47, 19.93), Seq(4.97))
    assert(lo === 19.93)
    assert(hi === 4.97)
    // the old symmetric take(k) compared 26.47 vs 4.97 → 1.331
    // (super-linear, nulled by the envelope); the banked floor is valid
    assert(eff(lo, hi) > 0.99 && eff(lo, hi) < 1.01)
    assert(eff(26.47, 4.97) > 1.25)
  }

  test("extra HIGH-side passes are truncated — they could only inflate " +
      "the ratio") {
    // high child banked 3 passes; only the first min(1,3)=1 counts, so
    // the later (faster) high passes cannot raise the efficiency
    val (lo, hi) = Bench.scalingFloors(Seq(20.0), Seq(6.0, 5.0, 4.0))
    assert(lo === 20.0)
    assert(hi === 6.0)
  }

  test("equal pass counts: plain per-side min (symmetric case unchanged)") {
    val (lo, hi) = Bench.scalingFloors(Seq(22.0, 20.0), Seq(5.5, 5.0))
    assert(lo === 20.0)
    assert(hi === 5.0)
  }

  test("one-sided rule is never favorable: adding a low pass can only " +
      "lower the reported efficiency") {
    val base = {
      val (lo, hi) = Bench.scalingFloors(Seq(21.0), Seq(5.0))
      eff(lo, hi)
    }
    // whatever the extra low pass measures, eff must not increase
    for (extra <- Seq(15.0, 21.0, 40.0)) {
      val (lo, hi) = Bench.scalingFloors(Seq(21.0, extra), Seq(5.0))
      assert(eff(lo, hi) <= base + 1e-12)
    }
  }

  test("empty side is rejected (no silent zero-sample floor)") {
    intercept[IllegalArgumentException] {
      Bench.scalingFloors(Seq.empty, Seq(5.0))
    }
    intercept[IllegalArgumentException] {
      Bench.scalingFloors(Seq(20.0), Seq.empty)
    }
  }
}
