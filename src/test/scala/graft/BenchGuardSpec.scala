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

  test("cross-CPU sweep is diverted off the committed artifact (r19)") {
    val line = """{"metric":"total","value":1.5,"queries":{"a":1.0},""" +
      """"cpus":32,"sf":"/root/testdata/sf0.1"}"""
    assert(Bench.parseCpus(line).contains(32))
    // a pre-r19 artifact has no cpus field: unknown → never diverts
    assert(Bench.parseCpus("""{"metric":"total","value":1.5}""").isEmpty)
    assert(!Bench.cpusMismatch(None, 8))
    // the r18 failure mode: driver's 8-core scaling sweep vs the
    // committed 32-core line → divert (and routing lands it in the
    // partial file via isPartial)
    assert(Bench.cpusMismatch(Some(32), 8))
    assert(Bench.fullOutputTarget(None,
      isPartial = Bench.cpusMismatch(Some(32), 8),
      contended = false) == "BENCH_full.partial.json")
    // same core count → the round's real sweep still commits
    assert(!Bench.cpusMismatch(Some(32), 32))
  }

  test("parseSf extracts the committed sweep's sf dir") {
    val line = """{"metric":"total","value":1.5,"queries":{"a":1.0},""" +
      """"sf":"/root/testdata/sf0.1"}"""
    assert(Bench.parseSf(line).contains("/root/testdata/sf0.1"))
    // the actual guard composition (the sf0.01 clobber case): the parsed
    // committed sf, normalized, must differ from the dev-loop dir —
    // driving isPartial and the BENCH_full.partial.json route
    assert(Bench.parseSf(line).exists(sf =>
      Bench.normPath(sf) != Bench.normPath("/root/testdata/sf0.01")))
    // and MATCH the committed dir itself, so the round's real sweep at
    // the same dir never diverts
    assert(Bench.parseSf(line).exists(sf =>
      Bench.normPath(sf) == Bench.normPath("/root/testdata/sf0.1")))
    assert(Bench.parseSf("""{"metric":"total","value":1.5}""").isEmpty)
    // the mismatch compare normalizes: spelling variants of the SAME dir
    // must not divert the round's real sweep off the committed artifact
    assert(Bench.normPath("/root/testdata/sf0.1/")
      == Bench.normPath("/root/testdata/sf0.1"))
    assert(Bench.normPath("/root/testdata/./sf0.1")
      == Bench.normPath("/root/testdata/sf0.1"))
    assert(Bench.normPath("/root/testdata/sf0.01")
      != Bench.normPath("/root/testdata/sf0.1"))
    // symlinked aliases of the same existing dir canonicalize together
    val link = java.nio.file.Paths.get(
      sys.props("java.io.tmpdir"),
      s"graft_normpath_link_${ProcessHandle.current().pid()}")
    java.nio.file.Files.deleteIfExists(link)
    java.nio.file.Files.createSymbolicLink(
      link, java.nio.file.Paths.get("/root/testdata/sf0.1"))
    try assert(Bench.normPath(link.toString)
      == Bench.normPath("/root/testdata/sf0.1"))
    finally java.nio.file.Files.deleteIfExists(link)
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

  test("classifySweep: sentinel needs loadavg corroboration to divert; " +
      "quiet-machine uniform slowdowns commit as regression suspects") {
    // quiet machine, sentinel clean: plain commit
    assert(Bench.classifySweep(sentinelTripped = false, 1.0, 8.0)
      == ((false, false)))
    // the r14 failure: sentinel trips WITH elevated external load
    assert(Bench.classifySweep(sentinelTripped = true, 6.5, 8.0)
      == ((true, false)))
    // ADVICE r15: a genuine uniform code regression on a QUIET machine
    // must NOT divert (else the committed baseline goes silently stale) —
    // it commits, flagged regression_suspect
    assert(Bench.classifySweep(sentinelTripped = true, 1.2, 8.0)
      == ((false, true)))
    // egregious pre-existing load alone is contended regardless
    assert(Bench.classifySweep(sentinelTripped = false, 9.0, 8.0)
      == ((true, false)))
  }

  test("initPartitionsFor: small inputs keep the plain-cores layout, " +
      "large inputs get the measured 2x ceiling") {
    val mib = 1L << 20
    // sf0.1 (~17 MB) stays at cores — the r15 floor regression's fix
    assert(GraftSession.initPartitionsFor(32, 18 * mib) == 32)
    assert(GraftSession.initPartitionsFor(32, 0L) == 32)
    // decade dirs (477 MB+) clear the threshold: ceiling engages
    assert(GraftSession.initPartitionsFor(32, 477 * mib) == 64)
    assert(GraftSession.initPartitionsFor(8, 5L << 30) == 16)
    // threshold boundary is inclusive
    assert(GraftSession.initPartitionsFor(4, 256 * mib) == 8)
    assert(GraftSession.initPartitionsFor(4, 256 * mib - 1) == 4)
  }

  test("statePartitionsFor: small inputs cap stateful stores at 8, " +
      "large inputs keep the cores default") {
    val mib = 1L << 20
    val f = graft.streaming.StreamingIngest.statePartitionsFor _
    // sf0.1-sized fixtures: store-commit overhead dominates — cap at 8
    assert(f(32, 18 * mib, 256L << 20) == 8)
    // fewer cores than the cap: never exceed cores
    assert(f(4, 18 * mib, 256L << 20) == 4)
    // at-scale inputs keep the session parallelism (stores are the
    // recovery/parallelism unit — a big stream wants more, not fewer)
    assert(f(32, 1L << 30, 256L << 20) == 32)
    assert(f(32, 256L << 20, 256L << 20) == 32) // boundary inclusive-large
  }

  test("bucketsFor: small inputs keep 8 fuller buckets, large inputs " +
      "track cores (the probe's parallelism ceiling)") {
    val mib = 1L << 20
    // sf0.1-sized fixtures: 8 buckets, fewer fuller files
    assert(GraftSession.bucketsFor(32, 18 * mib) == 8)
    // fewer cores than the small cap: never exceed cores
    assert(GraftSession.bucketsFor(4, 18 * mib) == 4)
    // decade dirs: bucket count = probe parallelism = cores (the fixed
    // 8 read 5.3x per 3.33x data at 1000x — BASELINE r16)
    assert(GraftSession.bucketsFor(32, 15L << 30) == 32)
    assert(GraftSession.bucketsFor(32, 256 * mib) == 32) // boundary
  }

  test("inputBytes sums regular files recursively, 0 for missing dirs") {
    val d = java.nio.file.Files.createTempDirectory("graft_ib_")
    try {
      java.nio.file.Files.writeString(d.resolve("a"), "12345")
      val sub = java.nio.file.Files.createDirectories(d.resolve("s"))
      java.nio.file.Files.writeString(sub.resolve("b"), "123")
      assert(GraftSession.inputBytes(d.toString) == 8L)
      assert(GraftSession.inputBytes(d.resolve("nope").toString) == 0L)
    } finally Queries.rmTree(d.toFile)
  }

  test("median: true median on odd and even counts") {
    assert(Bench.median(Seq(3.0)) == 3.0)
    assert(Bench.median(Seq(5.0, 1.0, 3.0)) == 3.0)
    // even count averages the two middle elements (upper-middle alone
    // biases high)
    assert(Bench.median(Seq(1.0, 2.0, 10.0, 4.0)) == 3.0)
  }

  test("spreadEntries: sub-threshold rows carry [min,max], heavy rows " +
      "and empty draws don't (r16 verdict task 3)") {
    val draws = Seq(
      "tiny" -> Seq(0.3, 2.7, 0.4, 0.5, 0.6),   // the archaeology class
      "heavy" -> Seq(20.0, 21.0, 19.0),          // above threshold: single-valued
      "edge" -> Seq(3.0, 3.0, 3.0),              // median == thresh: excluded
      "empty" -> Seq.empty[Double])
    val es = Bench.spreadEntries(draws, thresh = 3.0)
    assert(es == Seq("tiny" -> ((0.3, 2.7))))
    // input order is preserved across multiple qualifying rows
    val multi = Bench.spreadEntries(Seq(
      "b" -> Seq(1.0, 2.0), "a" -> Seq(0.1, 0.2)), thresh = 3.0)
    assert(multi.map(_._1) == Seq("b", "a"))
  }

  test("spreadEntries gates on the first-pass draws — the extra-draw " +
      "basis — not the combined median (ADVICE r17)") {
    // first 3 draws median 2.9 < 3.0 → took extra draws; the extra draws
    // drag the combined 5-draw median to 3.1 ≥ thresh. One basis means
    // the envelope still publishes (and covers all 5 draws).
    val borderline = Seq("edge" -> Seq(2.9, 2.8, 3.2, 4.0, 3.1))
    assert(Bench.spreadEntries(borderline, thresh = 3.0).isEmpty)
    assert(Bench.spreadEntries(borderline, thresh = 3.0, gateReps = 3) ==
      Seq("edge" -> ((2.8, 4.0))))
    // and a row whose first pass is ABOVE threshold never publishes,
    // regardless of later draws
    val heavy = Seq("heavy" -> Seq(3.5, 3.6, 3.4, 0.1))
    assert(Bench.spreadEntries(heavy, thresh = 3.0, gateReps = 3).isEmpty)
  }

  test("parseMinMaxMap reads the keyed envelope map and never aliases " +
      "the _own variant with the plain one") {
    val line = """{"queries_cold_minmax":{"a_b":[0.1,0.9],"c":[1.0,2.0]}""" +
      ""","queries_cold_minmax_own":{"a_b":[0.2,0.8]},"sf":"x"}"""
    assert(Bench.parseMinMaxMap(line, "queries_cold_minmax") ==
      Map("a_b" -> ((0.1, 0.9)), "c" -> ((1.0, 2.0))))
    assert(Bench.parseMinMaxMap(line, "queries_cold_minmax_own") ==
      Map("a_b" -> ((0.2, 0.8))))
    assert(Bench.parseMinMaxMap("{}", "queries_cold_minmax").isEmpty)
  }

  test("unionEnvelopes widens to cover the previous sweep's own draws " +
      "(two-sweep window, r17 verdict task 2)") {
    val own = Seq("a" -> ((1.0, 2.0)), "b" -> ((0.5, 0.7)))
    val prev = Map("a" -> ((1.5, 3.0)), "zz" -> ((9.0, 9.9)))
    // a: widened up to prev max; b: no prior row, stays own; prev-only
    // rows are NOT resurrected (a row must qualify in THIS sweep)
    assert(Bench.unionEnvelopes(own, prev) ==
      Seq("a" -> ((1.0, 3.0)), "b" -> ((0.5, 0.7))))
  }

  test("StandingTables.parseReps reads a child's scale line: rep order, " +
      "bare single-rep names, prefix-safe query matching") {
    val line = """{"metric":"scale300x","queries":{"span_dedup#2":28.810,""" +
      """"span_dedup#1":28.453,"span_dedup_x#1":9.9},"base":"b"}"""
    assert(StandingTables.parseReps(Seq("noise", line), "span_dedup") ==
      Seq(28.453, 28.810))
    val single = """{"metric":"scale1000x","queries":{"q1_pricing":61.2}}"""
    assert(StandingTables.parseReps(Seq(single), "q1_pricing") == Seq(61.2))
    assert(StandingTables.parseReps(Seq("no json here"), "q").isEmpty)
  }

  test("jnum formats with '.' decimals independent of default locale") {
    val prev = java.util.Locale.getDefault
    try {
      java.util.Locale.setDefault(java.util.Locale.GERMANY)
      assert(Bench.jnum(0.544) == "0.544")
      assert(Bench.jnum(1234.5) == "1234.500")
      assert(Bench.jnum(0.5444, 2) == "0.54")
      assert(Bench.jnum(0.98765, 4) == "0.9877")
    } finally java.util.Locale.setDefault(prev)
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
