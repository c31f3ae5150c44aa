package graft.graph

import graft.SparkSpec

/** [[Lpa.communities]]: hand-replayed synchronous rounds on two
  * triangles joined by a bridge — the mode-vote (count beats label
  * minimum), the deterministic tie-break, isolated-vertex identity, and
  * that LPA separates communities where MIN-label CC would flood. */
class LpaSpec extends SparkSpec {

  import spark.implicits._

  // triangle {1,2,3}, triangle {4,5,6}, bridge 3—4, isolated 7
  private def fixture = {
    val pages = (1L to 7L).toDF("page")
    val edges = Seq(
      (1L, 2L), (1L, 3L), (2L, 3L),
      (4L, 5L), (4L, 6L), (5L, 6L),
      (3L, 4L)
    ).toDF("src", "dst")
    (pages, edges)
  }

  private def run(rounds: Int): Map[Long, Long] = {
    val (pages, edges) = fixture
    Lpa.communities(pages, edges, rounds)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("round 1: all votes tie at count 1, the smallest neighbor label wins") {
    assert(run(1) == Map(1L -> 2L, 2L -> 1L, 3L -> 1L, 4L -> 3L,
      5L -> 4L, 6L -> 4L, 7L -> 7L))
  }

  test("round 2: a label seen twice beats a smaller label seen once") {
    // vertex 4 sees {1, 4, 4} and adopts 4, not the minimum 1
    assert(run(2) == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 4L,
      5L -> 3L, 6L -> 3L, 7L -> 7L))
  }

  test("round 3: the two triangles settle into separate communities") {
    assert(run(3) == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 3L,
      5L -> 3L, 6L -> 3L, 7L -> 7L))
  }

  test("zero rounds returns the identity labelling") {
    assert(run(0) == (1L to 7L).map(v => v -> v).toMap)
  }
}
