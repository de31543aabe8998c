package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench contention guard (VERDICT r14 task 1): a partial or
  * contended sweep must never overwrite the committed BENCH_full.json —
  * the r14 round committed a hot-machine sweep whose cold total read
  * 205.5 s against 154.9 s for the same tree measured quiet, polluting
  * the round-over-round signal.
  */
class BenchGuardSpec extends AnyFunSuite {

  test("full quiet sweep writes the committed artifact") {
    assert(Bench.fullOutputTarget(None, isPartial = false,
      contended = false) == "BENCH_full.json")
  }

  test("partial sweep without explicit path is diverted") {
    assert(Bench.fullOutputTarget(None, isPartial = true,
      contended = false) == "BENCH_full.partial.json")
    // partial AND contended still diverts (partial wins: the line isn't
    // a full-surface measurement either way)
    assert(Bench.fullOutputTarget(None, isPartial = true,
      contended = true) == "BENCH_full.partial.json")
  }

  test("contended full sweep is diverted") {
    assert(Bench.fullOutputTarget(None, isPartial = false,
      contended = true) == "BENCH_full.contended.json")
  }

  test("explicit path is always honored") {
    for (p <- Seq(true, false); c <- Seq(true, false))
      assert(Bench.fullOutputTarget(Some("/tmp/x.json"), p, c)
        == "/tmp/x.json")
  }

  test("sentinel: steady ratios pass, inflated or deflated medians trip") {
    assert(!Bench.sentinelContended(Nil)) // cold pass disabled: no signal
    assert(!Bench.sentinelContended(Seq(1.0, 1.05, 0.95)))
    // one outlier alone can't trip the median
    assert(!Bench.sentinelContended(Seq(1.0, 3.0, 0.98)))
    // run got busier: end-of-run re-times slower than its own medians
    assert(Bench.sentinelContended(Seq(1.5, 1.4, 1.6)))
    // run started hot and decayed: medians were inflated, re-times faster
    assert(Bench.sentinelContended(Seq(0.6, 0.65, 0.7)))
    // boundary: exactly the r14 observed 1.22x median inflation passes
    // (within run noise); the guard aims at the >1.35x class
    assert(!Bench.sentinelContended(Seq(1.22, 1.22, 1.22)))
  }
}
