package graft.graph

import graft.SparkSpec

/** [[Sssp.distances]]: closed-form weighted shortest paths on a
  * hand-built graph — weight-sensitive path choice, the fixed-round
  * contract, fixed-point stability, and unreachable-vertex exclusion. */
class SsspSpec extends SparkSpec {

  import spark.implicits._

  // 1—2 (w1) — 3 (w1), plus a direct heavy edge 1—3 (w5), a tail
  // 3—4 (w2), and an island 5—6 (w1); both directions provided, the
  // [[Sssp]] contract for undirected distance
  private def und = {
    val e = Seq(
      (1L, 2L, 1L), (2L, 3L, 1L), (1L, 3L, 5L), (3L, 4L, 2L),
      (5L, 6L, 1L)
    ).toDF("src", "dst", "w")
    e.unionAll(e.select(e("dst").as("src"), e("src").as("dst"), e("w")))
  }

  private def run(source: Long, rounds: Int): Map[Long, Long] =
    Sssp.distances(und, source, rounds)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("weighted distances prefer the light 2-hop path over the heavy edge") {
    assert(run(1L, 6) == Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 4L))
  }

  test("round 1 is direct-neighbor relaxation only; later rounds improve it") {
    // after one round vertex 3 still carries the direct w=5 edge cost
    assert(run(1L, 1) == Map(1L -> 0L, 2L -> 1L, 3L -> 5L))
    // round 2 relaxes 3 down to 2 via vertex 2 and reaches 4
    assert(run(1L, 2) == Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 7L))
  }

  test("extra rounds past the fixed point change nothing") {
    assert(run(1L, 12) == run(1L, 6))
  }

  test("islands are unreachable, not infinite; island-local runs work") {
    assert(!run(1L, 8).contains(5L))
    assert(run(5L, 8) == Map(5L -> 0L, 6L -> 1L))
  }

  test("a source with no edges yields exactly its own zero row") {
    assert(run(99L, 4) == Map(99L -> 0L))
  }

  test("an empty edge list is total: the source row, nothing else") {
    import spark.implicits._
    val empty = Seq.empty[(Long, Long, Long)].toDF("src", "dst", "w")
    val got = Sssp.distances(empty, 7L, rounds = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(7L -> 0L))
  }
}
