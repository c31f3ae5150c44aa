package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Deterministic hash-greedy random walks — the DeepWalk/node2vec
  * corpus-sampling primitive (Perozzi'14 §4.1: truncated random walks
  * as the "sentences" a graph-embedding trainer consumes): one
  * fixed-length walk per start vertex over the undirected view, where
  * the "random" neighbor choice at step t is the argmin over
  * out-neighbors of a 32-bit md5 hash of (start, t, neighbor).
  *
  * Derandomized by design, not convenience: a distributed sampler
  * must produce the SAME walk when a task retries or the data
  * repartitions (Spark recomputes lost partitions from lineage — an
  * RNG-seeded-per-task walk would silently diverge), and the
  * derandomized draw is what lets the DuckDB oracle replay the
  * selection exactly. Per (start, t) the hash ranks neighbors
  * uniformly at random in aggregate — the DeepWalk distribution —
  * while staying a pure function of the data.
  *
  * Scale shape: per step ONE shuffle join (the walk frontier — |V|
  * rows of (start, cur, steps, path) — against the edge list on cur)
  * plus one partial-agg'd argmin (`min(struct(h, nxt, …))`, the LPA
  * argmax pattern: a hub's candidate rows collapse map-side before the
  * wire). Total work O(L·|E|) worst case, O(L·Σ deg(visited)) in
  * practice; walk state is ~(3 ids + L·id) bytes per start vertex.
  * Dead ends (isolated vertices) keep their current position with the
  * step counter frozen — the walk is total on any graph.
  *
  * Not in the reference (no counterpart in
  * /root/reference/src/PageRank/PageRank.java); this extends the graph
  * family the same way BFS/SSSP/LPA do.
  */
object Walks {

  /** One hash-greedy walk of `steps` steps from every page.
    * Output: (start, dest, steps, path_md5) — dest is the final
    * vertex, steps counts actual moves (< `steps` only for dead
    * ends), path_md5 digests the full `a>b>c` visit sequence (what a
    * skip-gram trainer would consume). Unordered. */
  def hashGreedy(pages: DataFrame, edges: DataFrame, steps: Int): DataFrame = {
    // undirected view; duplicates from a symmetric pair are harmless
    // under the argmin, so no distinct shuffle is spent on them
    val und = edges.select(col("src"), col("dst"))
      .union(edges.select(col("dst").as("src"), col("src").as("dst")))
    var wk = pages.select(col("page").as("start"), col("page").as("cur"),
      lit(0L).as("steps"), col("page").as("path"))
    for (t <- 1 to steps) {
      // the dead-end (NULL dst) sentinel must be an explicit when():
      // concat_ws SKIPS null args (yielding "start:t", not NULL), so a
      // coalesce over the hash would never fire — the oracle assigns
      // Long.MaxValue to exactly this row
      val cand = wk.join(und.withColumnRenamed("src", "cur"), Seq("cur"), "left")
        .select(col("start"), col("steps"), col("path"),
          when(col("dst").isNotNull, TextFunctions.hash32(
            concat_ws(":", col("start"), lit(t), col("dst"))))
            .otherwise(lit(Long.MaxValue)).as("h"),
          coalesce(col("dst"), col("cur")).as("nxt"),
          when(col("dst").isNotNull, lit(1L)).otherwise(lit(0L)).as("inc"))
      // carried fields are constant per start (one walk per start), so
      // they ride the argmin struct; the order key is (h, nxt) — the
      // oracle's ROW_NUMBER(ORDER BY h, nxt) = 1
      wk = cand.groupBy("start").agg(
        min(struct(col("h"), col("nxt"), col("steps"), col("inc"),
          col("path"))).as("p"))
        .select(col("start"), col("p.nxt").as("cur"),
          (col("p.steps") + col("p.inc")).as("steps"),
          when(col("p.inc") === 1,
            concat(col("p.path"), lit(">"), col("p.nxt")))
            .otherwise(col("p.path")).as("path"))
    }
    wk.select(col("start"), col("cur").as("dest"), col("steps"),
      md5(col("path")).as("path_md5"))
  }
}
