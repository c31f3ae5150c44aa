package graft

import org.scalatest.funsuite.AnyFunSuite

/** [[Bench.contendedFlag]]: the mechanical discount-me predicate over
  * the machine probes the bench record already carries (VERDICT r12
  * item 3). The fixtures are the REAL probe values from the three r12
  * measurements of the same HEAD tree — the contaminated driver run
  * must flag, both clean runs must not. */
class BenchContentionSpec extends AnyFunSuite {

  test("r12 driver conditions (contaminated) are flagged") {
    // BENCH_r12: load_start "3.41 4.94 4.06", spark probe 0.325 vs the
    // 0.19-0.25 quiet norm — busy at launch alone must flag it
    assert(Bench.contendedFlag("3.41 4.94 4.06", 0.946, 0.940, 0.325, 0.330))
  }

  test("judge's clean re-run conditions stay unflagged") {
    // cpu 0.809->0.815, spark 0.191->0.250 (31% drift — scheduler noise
    // a clean run really shows, hence the Spark probe's wider 50%
    // allowance), load under 2
    assert(!Bench.contendedFlag("1.20 1.00 0.90", 0.809, 0.815, 0.191, 0.250))
  }

  test("builder's clean committed-record conditions stay unflagged") {
    // bench_out.json @ r12 HEAD: cpu 0.853, spark 0.238, load_start 1.99
    assert(!Bench.contendedFlag("1.99 2.40 2.10", 0.853, 0.860, 0.238, 0.240))
  }

  test("mid-run probe drift flags even when launch was quiet") {
    // contention arriving mid-run: start probes clean, end probes moved
    assert(Bench.contendedFlag("0.50 0.40 0.30", 0.80, 1.30, 0.20, 0.21))
    // corroborated spark drift: cpu moved 12%, spark doubled
    assert(Bench.contendedFlag("0.50 0.40 0.30", 0.80, 0.90, 0.20, 0.41))
  }

  test("uncorroborated spark-probe drift is engine self-state, not " +
      "contention (round 13)") {
    // the REAL r13 false positive: two runs under different machine
    // conditions both ended at spark 0.409x off a 0.18-0.20 start with
    // the cpu probe flat — deterministic post-catalog JVM state; must
    // NOT flag
    assert(!Bench.contendedFlag("1.30 3.03 3.95", 0.7685, 0.7487,
      0.1984, 0.4094))
    assert(!Bench.contendedFlag("0.50 0.40 0.30", 0.80, 0.81, 0.20, 0.35))
  }

  test("parallel-throughput drift flags WITHOUT 1-thread corroboration " +
      "(round 14)") {
    // the round-14 signature: totals +20% across every job-heavy query
    // while cpu and spark probes stayed flat/improved — only an
    // all-cores witness can see a multi-core throughput dip
    assert(Bench.contendedFlag("0.79 1.70 2.58", 0.886, 0.857, 0.205, 0.262,
      0.35, 0.52))
    // flat parallel probe on the same 1-thread readings must not flag
    assert(!Bench.contendedFlag("0.79 1.70 2.58", 0.886, 0.857, 0.205, 0.262,
      0.35, 0.38))
    // the 7-arg form preserves every 5-arg verdict
    assert(Bench.contendedFlag("3.41 4.94 4.06", 0.946, 0.940, 0.325, 0.330,
      0.35, 0.36))
    assert(!Bench.contendedFlag("1.20 1.00 0.90", 0.809, 0.815, 0.191, 0.250,
      0.35, 0.36))
  }

  test("launch on the tail of heavy work flags via the 5-min loadavg " +
      "(round 20)") {
    // the REAL r19 judge contamination: second anchor run launched at
    // "0.51 3.20 ..." — 1-min fully recovered, 5-min still draining the
    // first run's tail — and read 129 s vs 109.6 s same-code. The 1-min
    // check alone passed it clean.
    assert(Bench.contendedFlag("0.51 3.20 2.80", 0.80, 0.81, 0.20, 0.21))
    // steady moderate load (1-min between 1 and 2) with an elevated
    // 5-min is the state real CLEAN records carried — must not flag
    assert(!Bench.contendedFlag("1.30 3.03 3.95", 0.80, 0.81, 0.20, 0.21))
    // quiet in both windows stays clean
    assert(!Bench.contendedFlag("0.50 1.70 2.58", 0.80, 0.81, 0.20, 0.21))
  }

  test("unparseable loadavg falls back to probe drift only") {
    assert(!Bench.contendedFlag("n/a", 0.80, 0.81, 0.20, 0.21))
    assert(Bench.contendedFlag("n/a", 0.80, 1.30, 0.20, 0.21))
  }

  test("ioProbe does fixed disk work, returns seconds, leaves no file") {
    val tmp = java.nio.file.Paths.get(
      sys.props.getOrElse("java.io.tmpdir", "/tmp"))
    val dt = Bench.ioProbe()
    assert(dt > 0.0 && dt < 120.0)
    // probe must clean up after itself — a leaked 256 MiB temp file per
    // bench run would eventually contaminate tmp_free_gb
    import scala.jdk.CollectionConverters._
    val leaked = java.nio.file.Files.list(tmp).iterator().asScala
      .exists(_.getFileName.toString.startsWith("graft_io_probe"))
    assert(!leaked)
  }

  test("gcMs is a non-negative monotone counter (round-20 gc_s ledger)") {
    val a = Bench.gcMs()
    assert(a >= 0L)
    // allocate enough to plausibly trigger a young collection, then
    // request one explicitly; the counter must never move backwards
    var junk: Array[Byte] = null
    (1 to 64).foreach(_ => junk = new Array[Byte](4 << 20))
    if (junk.length == -1) println("") // keep the allocation live
    System.gc()
    val b = Bench.gcMs()
    assert(b >= a)
  }
}
