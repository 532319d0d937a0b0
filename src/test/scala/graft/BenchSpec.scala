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

  test("validity verdicts: clean pair publishes, each physically-" +
      "impossible signature nulls with its own reason") {
    // clean window (run 12's first pair): publish
    assert(Bench.scalingInvalidReason(1.002, inproc = false,
      Some(0.8)).isEmpty)
    // merely slow window without super-linear proof (runs 11/13):
    // publish — the gate never cherry-picks
    assert(Bench.scalingInvalidReason(0.522, inproc = false,
      Some(1.1)).isEmpty)
    assert(Bench.scalingInvalidReason(0.662, inproc = false, None).isEmpty)
    // in-proc is never gate evidence (round 4's 25.7)
    assert(Bench.scalingInvalidReason(0.9, inproc = true, None)
      .contains("inproc_fallback_is_not_gate_evidence"))
    // low side proven broken: 2->8 super-linear (run 14's 1.331)
    assert(Bench.scalingInvalidReason(1.331, inproc = false, None)
      .contains("outside_sanity_envelope_0_to_1.25"))
    // high side proven broken: 8->32 super-linear crosscheck (run 15
    // measured eff 0.182 with highPair 1.881 — the 8-core score pass
    // was 3.5x its clean floor while the 2- and 32-core sides were
    // normal; a falsely-LOW number is still an invalid number)
    assert(Bench.scalingInvalidReason(0.182, inproc = false, Some(1.881))
      .contains("high_side_contaminated_max_crosscheck_superlinear"))
    // NaN anywhere is invalid — and a NaN crosscheck must NOT assert a
    // proven contamination, only that the crosscheck gave no reading
    assert(Bench.scalingInvalidReason(Double.NaN, inproc = false, None)
      .contains(Bench.ReasonEnvelope))
    assert(Bench.scalingInvalidReason(0.9, inproc = false,
      Some(Double.NaN)).contains(Bench.ReasonMaxUnreadable))
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
