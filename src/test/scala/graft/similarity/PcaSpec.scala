package graft.similarity

import graft.{SparkEntry, SparkSpec, Tables}

/** `q_embed_pca` against an independent driver-side replay (raw floats
  * → fixed-point → exact BigInt moments → covariance → snapped power
  * iteration → projection, no Spark expressions), plus the property
  * that makes the answer PCA and not just a deterministic number: the
  * variance of the emitted projection beats the variance along every
  * coordinate axis (the leading eigenvalue dominates), and the learned
  * direction is a fixed point of the covariance map (Rayleigh residual
  * small relative to the eigenvalue). */
class PcaSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.01"
  private val D = 64
  private val F = 1048576L

  private def replay(): (Map[Long, Double], Array[Double], Array[Array[Double]]) = {
    val rows = Tables.embeddings(spark, dir).select("vec_id", "embedding")
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    val n = rows.length
    val xf = rows.map { case (id, e) =>
      (id, e.map(x => math.floor(x.toDouble * F).toLong))
    }
    val s = new Array[BigInt](D)
    java.util.Arrays.fill(s.asInstanceOf[Array[AnyRef]], BigInt(0))
    val p = Array.fill(D, D)(BigInt(0))
    xf.foreach { case (_, v) =>
      var i = 0
      while (i < D) {
        s(i) += v(i)
        var j = 0
        while (j < D) { p(i)(j) += BigInt(v(i)) * v(j); j += 1 }
        i += 1
      }
    }
    val (nD, fD) = (n.toDouble, F.toDouble)
    val cov = Array.tabulate(D, D)((i, j) =>
      (BigInt(n) * p(i)(j) - s(i) * s(j)).toDouble / nD / nD / fD / fD)
    val mu = Array.tabulate(D)(i => s(i).toDouble / nD / fD)
    var v = Array.tabulate(D)(i => if (i == 0) 1.0 else 0.0)
    for (_ <- 1 to 24) {
      val raw = Array.tabulate(D) { i =>
        var acc = 0.0; var j = 0
        while (j < D) { acc += cov(i)(j) * v(j); j += 1 }
        acc
      }
      val nrm = math.sqrt(raw.map(x => x * x).sum)
      v = raw.map(x => math.floor(x / nrm * 1.0e9 + 0.5) / 1.0e9)
    }
    if (v(0) < 0) v = v.map(x => -x)
    val proj = xf.map { case (id, e) =>
      var acc = 0.0; var i = 0
      while (i < D) { acc += (e(i) / fD - mu(i)) * v(i); i += 1 }
      (id, math.floor(acc * 1.0e6 + 0.5) / 1.0e6)
    }.toMap
    (proj, v, cov)
  }

  test("projections match the replayed snapped power iteration exactly") {
    val got = SparkEntry.queries("q_embed_pca")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    val (expected, _, _) = replay()
    assert(got.keySet == expected.keySet)
    got.foreach { case (id, x) =>
      assert(x == expected(id), s"vec $id: $x vs ${expected(id)}")
    }
  }

  test("the direction is principal: projection variance dominates every " +
      "axis and the Rayleigh residual is small") {
    val (proj, v, cov) = replay()
    val vals = proj.values.toArray
    val m = vals.sum / vals.length
    val varProj = vals.map(x => (x - m) * (x - m)).sum / vals.length
    val maxAxisVar = (0 until D).map(i => cov(i)(i)).max
    assert(varProj >= maxAxisVar,
      s"projection variance $varProj below best axis $maxAxisVar — " +
        "not a leading direction")
    // C·v ≈ λ·v with λ = vᵀCv: 24 snapped power iterations (PcaIters)
    // should be well inside 5% relative residual on this spectrum
    val cv = Array.tabulate(D)(i =>
      (0 until D).map(j => cov(i)(j) * v(j)).sum)
    val lam = (0 until D).map(i => v(i) * cv(i)).sum
    val residual = math.sqrt(
      (0 until D).map(i => math.pow(cv(i) - lam * v(i), 2)).sum) /
      math.abs(lam)
    assert(residual < 0.05, s"Rayleigh residual $residual — not converged")
  }
}
