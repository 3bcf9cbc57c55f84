package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.queries.LlmOps.labelAwareNProbe

/** The label-aware probe policy (LlmOps.labelAwareNProbe) — pure
  * function, so its contracts are pinned exhaustively:
  *
  *   - BUDGET: the cells taken never exceed the row budget (beyond the
  *     minProbe floor, which is allowed to overshoot — a floor that
  *     respected the budget would starve exactly the selective
  *     predicates the policy exists for);
  *   - MONOTONICITY (the cure property): scaling every occupancy DOWN
  *     never yields FEWER probed cells — a more selective predicate
  *     probes at least as many cells at the same budget;
  *   - clamps: result always within [minProbe, min(maxProbe, ...)],
  *     zero-occupancy prefixes are free, and an all-zero occupancy
  *     (predicate entirely outside the corpus) probes maxProbe cells
  *     for zero rows — maximal coverage at zero cost.
  */
class ProbePolicySpec extends AnyFunSuite with Matchers {

  test("budget respected past the floor; floor may overshoot") {
    // occupancies 10 each, budget 35 → 3 cells fit, floor 1 → 3
    labelAwareNProbe(Seq.fill(10)(10L), 35L, 1, 10) shouldBe 3
    // floor 5 overshoots the budget deliberately
    labelAwareNProbe(Seq.fill(10)(10L), 35L, 5, 10) shouldBe 5
  }

  test("sparser occupancy probes more cells at the same budget") {
    val dense = Seq.fill(20)(10L)
    val sparse = Seq.fill(20)(1L)
    val pd = labelAwareNProbe(dense, 40L, 4, 20)
    val ps = labelAwareNProbe(sparse, 40L, 4, 20)
    pd shouldBe 4
    ps shouldBe 20
    assert(ps >= pd)
  }

  test("all-zero occupancy probes maxProbe cells for zero rows") {
    labelAwareNProbe(Seq.fill(50)(0L), 10L, 4, 50) shouldBe 50
    labelAwareNProbe(Seq.fill(50)(0L), 10L, 4, 12) shouldBe 12
  }

  test("clamps hold and scaling occupancy down is monotone (property)") {
    val rnd = new scala.util.Random(151)
    for (_ <- 1 to 500) {
      val occ = Seq.fill(1 + rnd.nextInt(64))(rnd.nextInt(1000).toLong)
      val budget = rnd.nextInt(10000).toLong
      val maxP = occ.size
      val p = labelAwareNProbe(occ, budget, 1, maxP)
      assert(p >= 1 && p <= maxP)
      // past the floor, the whole prefix stays within budget (floor
      // cells are unconditional, so a floor-only result may not)
      if (p > 1) assert(occ.take(p).sum <= budget)
      // halving occupancy never probes fewer cells
      val pHalf = labelAwareNProbe(occ.map(_ / 2), budget, 1, maxP)
      assert(pHalf >= p)
    }
  }
}
