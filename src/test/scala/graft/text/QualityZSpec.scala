package graft.text

import graft.{SparkEntry, SparkSpec}

/** `q_text_quality_z` laws on the real sf0.001 documents: the z scores
  * reconstruct from the engine's own quality gate via exact BigInt
  * moments (within one presentation-grid step), and each source's
  * z distribution is standard — mean ~0, population variance ~1. */
class QualityZSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("z reconstructs from exact per-source moments of the quantized " +
      "quality score") {
    val quality = SparkEntry.queries("q_text_quality")(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getDouble(4)).toMap
    val got = SparkEntry.queries("q_text_quality_z")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))

    val qi = quality.map { case (id, q) =>
      id -> BigInt(math.floor(q * 1.0e6 + 0.5).toLong)
    }
    val bySrc = got.groupBy(_._2)
    bySrc.foreach { case (_, rows) =>
      val ids = rows.map(_._1)
      val n = BigInt(ids.length)
      val s = ids.map(qi).sum
      val p = ids.map(id => qi(id) * qi(id)).sum
      val v = n * p - s * s
      rows.foreach { case (id, _, z) =>
        val ref =
          if (v == 0) 0.0
          else {
            val raw = (qi(id).toDouble - s.toDouble / n.toDouble) /
              (math.sqrt(v.toDouble) / n.toDouble)
            math.floor(raw * 1.0e6 + 0.5) / 1.0e6
          }
        assert(math.abs(z - ref) < 2e-6, s"doc $id z $z vs $ref")
      }
    }
  }

  test("per-source standardization: mean ~0 and population variance ~1") {
    val got = SparkEntry.queries("q_text_quality_z")(spark, dir)
      .collect().map(r => (r.getString(1), r.getDouble(2)))
    got.groupBy(_._1).foreach { case (src, rows) =>
      val zs = rows.map(_._2)
      val mean = zs.sum / zs.length
      val varz = zs.map(z => (z - mean) * (z - mean)).sum / zs.length
      assert(math.abs(mean) < 1e-3, s"$src mean $mean")
      assert(math.abs(varz - 1.0) < 1e-2, s"$src variance $varz")
    }
  }
}
