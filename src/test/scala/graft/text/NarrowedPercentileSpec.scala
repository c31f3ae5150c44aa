package graft.text

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}
import graft.queries.TextQueries

/** [[TextQueries.narrowedP75]] — the histogram-narrowing replacement
  * for the exact `percentile` aggregate in q_text_quality_cut — must
  * be BIT-EQUAL to `percentile(qq, 3/4)`, not merely close: the keep
  * flags ride a strict > against the cut, and the whole point of
  * narrowing is exactness without a per-source value buffer. Pinned
  * on the gate corpus AND on adversarial constructed sources
  * (integral interpolation positions, all-equal values, single rows,
  * values straddling bin edges). */
class NarrowedPercentileSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.01"

  private def exactCuts(scored: org.apache.spark.sql.DataFrame) =
    scored.groupBy("source")
      .agg(expr("percentile(qq, cast(3 as double)/4)").as("cut"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap

  private def narrowedCuts(scored: org.apache.spark.sql.DataFrame) =
    TextQueries.narrowedP75(scored)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap

  test("narrowed p75 == exact percentile, bit-for-bit, on the gate corpus") {
    val scored = Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"), length(col("text")).as("len"))
      .withColumn("qq",
        floor(col("len").cast("double") / 7919.0 * lit(1.0e6) + lit(0.5))
          / lit(1.0e6))
    val exact = exactCuts(scored)
    val narrowed = narrowedCuts(scored)
    assert(exact.keySet == narrowed.keySet)
    assert(exact.nonEmpty)
    exact.foreach { case (src, cut) =>
      assert(java.lang.Double.doubleToLongBits(narrowed(src)) ==
        java.lang.Double.doubleToLongBits(cut),
        s"source $src: narrowed ${narrowed(src)} != exact $cut")
    }
  }

  test("narrowed p75 == exact percentile on adversarial constructed sources") {
    import spark.implicits._
    val snap = (x: Double) => math.floor(x * 1.0e6 + 0.5) / 1.0e6
    val rnd = new scala.util.Random(14)
    val rows = Seq.newBuilder[(String, Double)]
    // n ≡ 1 (mod 4) makes pos = 0.75·(n−1) integral — the kLo == kHi
    // branch; n ≡ 2 (mod 4) gives frac 0.75; plus sizes crossing the
    // 128-bin granularity both ways
    for ((n, tag) <- Seq(1 -> "one", 4 -> "tiny", 5 -> "integral",
        6 -> "frac75", 129 -> "overbins", 1000 -> "big")) {
      (1 to n).foreach(_ => rows += (s"s_$tag" -> snap(rnd.nextDouble())))
    }
    // all-equal source: hi == lo degenerate bin, cut = the value
    (1 to 7).foreach(_ => rows += ("s_const" -> 0.421337))
    // two distinct values only — vLo/vHi equality branch
    (1 to 10).foreach(i => rows += ("s_two" -> (if (i < 9) 0.25 else 0.75)))
    val scored = rows.result().toDF("source", "qq")
    val exact = exactCuts(scored)
    val narrowed = narrowedCuts(scored)
    assert(exact.keySet == narrowed.keySet && exact.size == 8)
    exact.foreach { case (src, cut) =>
      assert(java.lang.Double.doubleToLongBits(narrowed(src)) ==
        java.lang.Double.doubleToLongBits(cut),
        s"source $src: narrowed ${narrowed(src)} != exact $cut")
    }
  }
}
