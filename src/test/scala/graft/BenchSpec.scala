package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the bench guard's ambient adjudication (judge r13 Next #3): the
  * r13 artifact carried a 15.2 s q191 reading (steady-state ~2 s) that
  * passed the 10×-median poisoned-history cap AND the post-guard median
  * (3 of 5 reps landed inside one slow window, so the median of all five
  * was still the spike). The rule under test: >3× history on a run whose
  * CONTROLS measured calm → keep the smallest successful rep.
  */
class BenchSpec extends AnyFunSuite {

  test("q191 scenario: 3 spike reps + 2 calm guard reps, calm controls -> " +
      "min rep reported (the old median kept the spike)") {
    // three timed reps inside the ambient window, then the history guard's
    // two extra reps landing at steady-state — exactly r13's q191 shape
    val times = Seq(15.2, 15.3, 15.1, 2.9, 3.0)
    assert(Bench.med(times) == 15.1) // the old reported value — the bug
    assert(Bench.adjudicate(times, hist = Some(2.0), controlsCalm = true) == 2.9)
  }

  test("non-calm controls: the median stands even >3x history") {
    val times = Seq(15.2, 15.3, 15.1, 2.9, 3.0)
    assert(Bench.adjudicate(times, hist = Some(2.0), controlsCalm = false) == 15.1)
  }

  test("genuine 3x regression survives adjudication: every rep is slow, " +
      "so the min is honest") {
    val times = Seq(6.1, 6.0, 6.2, 6.1, 6.0)
    assert(Bench.adjudicate(times, hist = Some(2.0), controlsCalm = true) == 6.0)
  }

  test("within-3x readings and no-history queries report the median") {
    assert(Bench.adjudicate(Seq(2.4, 2.5, 2.6), Some(2.0), controlsCalm = true) == 2.5)
    assert(Bench.adjudicate(Seq(15.2, 15.3, 15.1), None, controlsCalm = true) == 15.2)
    // sub-floor history (noise) never triggers min-reporting
    assert(Bench.adjudicate(Seq(0.30, 0.10, 0.32), Some(0.01), controlsCalm = true) == 0.30)
  }

  test("failed reps: -1 markers are ignored by both median and min; " +
      "all-failed reports -1") {
    assert(Bench.med(Seq(-1.0, 2.0, 3.0)) == 3.0)
    assert(Bench.adjudicate(Seq(-1.0, 15.0, 15.1, 2.9), Some(2.0),
      controlsCalm = true) == 2.9)
    assert(Bench.adjudicate(Seq(-1.0, -1.0), Some(2.0), controlsCalm = true) == -1.0)
  }
}
