package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pure-function pins for the occupancy-scaled knobs whose DuckDB
  * oracles mirror them arithmetically. The oracle runs only exercise
  * two corpus sizes (500 at the gate, 20k at the 10× replica), so a
  * drifted edit that happens to agree at those two points (a
  * floor-vs-ceil swap, an off-by-one on a power-of-two boundary)
  * would ship unseen — these pins hold the full contract with
  * EXPLICIT expected values, never a re-derivation of the formula:
  *
  *  - ivfK(n) = max(16, ⌈√n / 2⌉), SQL twin
  *    `GREATEST(16, CAST(ceil(sqrt(count(*)) / 2.0) AS BIGINT))`;
  *    floor boundary at n = 1024 (√1024/2 = 16 exactly).
  *  - neardupTopkBits(n) = max(16, ⌈log₂ n⌉ + 2) via exact integer
  *    bit-length (no float log2), SQL twin
  *    `GREATEST(16, length(bin(GREATEST(1, n-1))) + 2)`; floor
  *    boundary at n = 2^14 (⌈log₂ 16384⌉ = 14 → 16).
  */
class KnobSpec extends AnyFunSuite {
  import graft.sim.SimQueries.{ivfK, ivfNprobe, neardupTopkBits}

  test("ivfK: floor regime, exact boundary, and √n growth") {
    assert(ivfK(0) == 16)
    assert(ivfK(1) == 16)
    assert(ivfK(500) == 16)    // the sf0.01 gate corpus
    assert(ivfK(1024) == 16)   // √1024/2 = 16: last floor value
    assert(ivfK(1025) == 17)   // first above-floor value
    assert(ivfK(2000) == 23)   // sf0.1 (measured-recall point)
    assert(ivfK(20000) == 71)  // the 10× replica oracle regime
    assert(ivfK(2000000) == 708)
  }

  test("ivfNprobe = ⌈√(2K)⌉: explicit values at every regime the " +
    "oracles and RECALL.json exercise, SQL twin " +
    "CAST(ceil(sqrt(2 * K)) AS BIGINT)") {
    assert(ivfNprobe(16) == 6)   // K floor (sf0.01 gate, sf0.001 suite)
    assert(ivfNprobe(18) == 6)   // √36 = 6 exactly: last value-6 K
    assert(ivfNprobe(19) == 7)   // first value-7 K
    assert(ivfNprobe(23) == 7)   // sf0.1 — measured recall 0.690
    assert(ivfNprobe(71) == 12)  // 10× replica — measured recall 0.848
    assert(ivfNprobe(708) == 38) // the 2M-vector regime
  }

  test("neardupTopkBits: floor regime, exact power-of-two boundaries, " +
    "and the replica regime — explicit values") {
    assert(neardupTopkBits(1) == 16)
    assert(neardupTopkBits(500) == 16)     // the sf0.01 gate corpus
    assert(neardupTopkBits(16384) == 16)   // 2^14: last floor value
    assert(neardupTopkBits(16385) == 17)   // first above-floor value
    assert(neardupTopkBits(20000) == 17)   // the 10× replica regime
    assert(neardupTopkBits(32768) == 17)   // 2^15: ⌈log₂⌉ = 15 → 17
    assert(neardupTopkBits(32769) == 18)
    assert(neardupTopkBits(1000000) == 22) // ⌈log₂ 1e6⌉ = 20 → 22
  }
}
