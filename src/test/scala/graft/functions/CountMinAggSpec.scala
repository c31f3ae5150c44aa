package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class CountMinAggSpec extends SparkSpec {

  private val D = 4
  private val W = 64

  /** In-memory reference estimate from a counter matrix. */
  private def estimate(cms: Seq[Long], x: Long): Long =
    (0 until D).map(j => cms(j * W + CountMinAgg.bucket(x, j, W))).min

  test("sketch is invariant under partitioning and estimates never under-count") {
    val s = spark
    import s.implicits._
    val cms = udaf(new CountMinAgg(D, W))
    val rnd = new scala.util.Random(5)
    // skewed stream: value v appears v times (v = 1..40) + nulls
    val values = (1L to 40L).flatMap(v => Seq.fill(v.toInt)(v)) ++
      Seq.fill(5)(-1L)
    val data: Seq[java.lang.Long] =
      rnd.shuffle(values).map(v => if (v == -1L) null else java.lang.Long.valueOf(v))
    val baseline = data.toDF("h").repartition(1)
      .agg(cms(col("h")).as("cms")).head().getSeq[Long](0)
    for (parts <- Seq(3, 8)) {
      val got = data.toDF("h").repartition(parts)
        .agg(cms(col("h")).as("cms")).head().getSeq[Long](0)
      assert(got == baseline, s"parts=$parts") // merge = exact counter add
    }
    assert(baseline.sum == D * values.count(_ != -1L)) // nulls ignored
    (1L to 40L).foreach { v =>
      assert(estimate(baseline, v) >= v, s"under-count for $v")
    }
  }

  test("with no collisions the estimate is exact") {
    val s = spark
    import s.implicits._
    // few distinct values in a wide sketch: rows may still collide by
    // chance, so assert the guaranteed side (>=) AND exactness for a
    // single-value stream (nothing to collide with)
    val cms = udaf(new CountMinAgg(D, W))
    val got = Seq.fill(7)(java.lang.Long.valueOf(123L)).toDF("h")
      .agg(cms(col("h")).as("cms")).head().getSeq[Long](0)
    assert(estimate(got, 123L) == 7L)
    assert(got.sum == D * 7L)
  }
}
