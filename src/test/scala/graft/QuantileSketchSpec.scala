package graft

import org.apache.spark.sql.functions._

import graft.queries.RelationalQueries

/** q_percentiles_sketch properties: the histogram estimate lands within
  * one bin width of the exact quantile, and the result is invariant to
  * input partitioning (the mergeability that justifies the sketch at
  * scale — bin counts partial-aggregate map-side in any layout).
  */
class QuantileSketchSpec extends SparkSpec {

  private def write(dir: String, parts: Int): Unit = {
    val s = spark
    import s.implicits._
    // two groups with different shapes: uniform 1..1000 and a skewed
    // square-law tail
    val rows = (1 to 1000).map(i => ("A", i.toDouble)) ++
      (1 to 500).map(i => ("B", (i.toLong * i).toDouble))
    rows.toDF("l_returnflag", "l_extendedprice")
      .repartition(parts)
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
  }

  test("estimates land within one bin width of the exact quantile") {
    val d = java.nio.file.Files.createTempDirectory("graft-qsk").toString
    write(d, 3)
    val got = RelationalQueries.queries("q_percentiles_sketch")(spark, d)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3)))).toMap
    // group A: uniform 1..1000, bin width = 999/128 ≈ 7.8
    val (nA, p50A, p95A) = got("A")
    assert(nA == 1000)
    assert(math.abs(p50A - 500.0) <= 999.0 / 128 + 1)
    assert(math.abs(p95A - 950.0) <= 999.0 / 128 + 1)
    // group B: squares 1..250000, bin width ≈ 1953 — the tail quantile
    // still lands inside its (coarse) bin
    val (nB, p50B, p95B) = got("B")
    assert(nB == 500)
    assert(math.abs(p50B - 250.0 * 250) <= (250000.0 - 1) / 128 + 1)
    assert(math.abs(p95B - 475.0 * 475) <= (250000.0 - 1) / 128 + 1)
  }

  test("result is invariant to input partitioning (mergeable bins)") {
    val d1 = java.nio.file.Files.createTempDirectory("graft-qsk1").toString
    val d17 = java.nio.file.Files.createTempDirectory("graft-qsk17").toString
    write(d1, 1)
    write(d17, 17)
    def run(d: String) =
      RelationalQueries.queries("q_percentiles_sketch")(spark, d)
        .collect().map(r =>
          (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
        .toSeq
    assert(run(d1) == run(d17))
  }
}
