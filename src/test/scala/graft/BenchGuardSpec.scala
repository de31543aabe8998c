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

  test("sentinel: uniform inflation vs the committed artifact trips, " +
      "targeted regressions and first runs don't") {
    assert(!Bench.sentinelContended(Nil)) // first run / cold disabled
    assert(!Bench.sentinelContended(Seq(1.0, 1.05, 0.95)))
    // a code regression moves SPECIFIC queries: the wide median holds
    assert(!Bench.sentinelContended(Seq.fill(50)(1.0) ++ Seq(3.0, 4.0)))
    // the r14 failure shape: ~uniform 1.22x median inflation across the
    // surface — a machine artifact, must trip
    assert(Bench.sentinelContended(Seq.fill(50)(1.22) ++ Seq(0.9, 1.0)))
    // a faster round never trips
    assert(!Bench.sentinelContended(Seq.fill(50)(0.7)))
  }

  test("parseColdMap extracts the committed cold medians") {
    val line = """{"metric":"total","value":1.5,"queries":{"a_b":1.0},""" +
      ""","total_cold":2.0,"queries_cold":{"a_b":0.544,"c_d9":4.158},""" +
      """"by_class":{"pure":1.0}}"""
    val m = Bench.parseColdMap(line)
    assert(m == Map("a_b" -> 0.544, "c_d9" -> 4.158))
    assert(Bench.parseColdMap("{}").isEmpty)
    assert(Bench.parseColdMap("""{"queries_cold":{}}""").isEmpty)
  }
}
