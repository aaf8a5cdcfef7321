package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** Anchor-sync pin for the cross-commit A/B harness: `graft.ABBench`
  * is overlaid VERBATIM onto baseline worktrees, so it must stay
  * self-contained — its canary iteration count and reference anchor
  * are literals duplicated from `graft.Bench`. A drift between the
  * two silently corrupts every cross-commit drift-normalized ratio
  * (the exact failure class Bench's per-iteration anchor refactor
  * closed in r15), so the HEAD tree enforces equality here while the
  * overlay file itself stays dependency-free. */
class BenchAnchorSyncSpec extends AnyFunSuite {

  test("ABBench's canary anchor equals Bench's") {
    assert(graft.ABBench.CanaryIters === graft.Bench.CanaryIters,
      "ABBench.CanaryIters drifted from Bench.CanaryIters")
    assert(graft.ABBench.CanaryRefSec === graft.Bench.CanaryRefSec,
      "ABBench.CanaryRefSec drifted from Bench.CanaryRefSec — " +
        "cross-commit norm ratios would silently mis-anchor")
  }
}
