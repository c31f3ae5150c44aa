package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The shared HLL estimate path — ONE copy of the float-sensitive
  * expressions for both consumers (q_distinct_hll, q_stream_distinct)
  * and their oracles. Two cross-engine float traps live here, and each
  * was originally fixed in one copy and missed in the other until
  * review:
  *   - bare decimal literals (0.7213, 1.079) parse as DECIMALs whose
  *     division rules differ between Spark and DuckDB — alpha is CAST
  *     to DOUBLE on both sides;
  *   - round(x, 2) resolves decimal ties half-up (Spark) vs the
  *     platform rule (DuckDB), and e_raw — a fixed double over a
  *     dyadic-rational register sum — can land exactly on a boundary
  *     (sf0.1: 689.355 → .35 vs .36). The presentation is the
  *     order-identical floor(x·100 + 0.5)/100 on both engines, which
  *     is bit-deterministic wherever the value lands.
  *
  * Every expression is derived from the precision `p` (register count
  * m = 2^p, rank window 60 − p bits — the [[graft.functions.HllAgg]]
  * hash layout), so a consumer wiring a different-p aggregator cannot
  * silently score against the wrong m. p ≥ 7 because the closed-form
  * alpha fit 0.7213/(1 + 1.079/m) holds for m ≥ 128 (Flajolet'07 §4);
  * the catalog gates use the default p = 8.
  *
  * All column expressions read a `regs` column: the m-register array
  * emitted by HllAgg(p).
  */
private[queries] object HllShared {

  private def m(p: Int): Int = {
    require(p >= 7 && p <= 16, s"p must be in [7, 16], got $p")
    1 << p
  }

  /** Raw estimate alpha_m·m²/Σ2⁻ʳ (Flajolet'07). */
  def eRaw(p: Int = 8): Column = {
    val mm = m(p)
    expr(s"(CAST(0.7213 AS DOUBLE) / (CAST(1.0 AS DOUBLE) + " +
      s"CAST(1.079 AS DOUBLE) / $mm)) * ${mm.toLong * mm} / " +
      "aggregate(regs, CAST(0.0 AS DOUBLE), " +
      "(acc, r) -> acc + power(0.5, r))")
  }

  /** Empty-register count (drives the linear-counting fallback). */
  val nZero: Column = expr("size(filter(regs, r -> r = 0))").cast("long")

  /** Bias-corrected estimate at 2 decimals: linear counting below the
    * 2.5·m threshold, floor-form presentation (see scaladoc above). */
  def est2(p: Int = 8): Column = {
    val mm = m(p)
    val est = when(eRaw(p) <= 2.5 * mm && nZero > 0,
      lit(mm.toDouble) * log(lit(mm.toDouble) / nZero)).otherwise(eRaw(p))
    floor(est * lit(100.0) + lit(0.5)) / lit(100.0)
  }

  /** Oracle CTE chain `w, r, grid, regs, s, e` rebuilding the register
    * array and raw estimate per `key` over `src(key, hv)` — hv the
    * 60-bit md5 hash, same bucket/rho integer functions as the
    * aggregator (rho window = 60 − p bits, all-zero window scores
    * 61 − p). Callers SELECT from `e(key, regs_csv, n_zero, e_raw)`
    * and present the estimate with [[estSql]]. */
  def oracleCtes(key: String, src: String, p: Int = 8): String = {
    val mm = m(p)
    val rhoMax = 61 - p
    s"""w AS (SELECT $key, hv % $mm AS b, hv // $mm AS wv FROM $src),
          r AS (SELECT $key, b,
                       MAX(CASE WHEN wv = 0 THEN $rhoMax
                                ELSE $rhoMax - length(bin(wv)) END) AS rho
                FROM w GROUP BY 1, 2),
          grid AS (SELECT DISTINCT g0.$key, mr.range AS b
                   FROM $src g0 CROSS JOIN range(0, $mm) mr),
          regs AS (SELECT g.$key, g.b, COALESCE(r.rho, 0) AS rho
                   FROM grid g LEFT JOIN r
                     ON r.$key = g.$key AND r.b = g.b),
          s AS (SELECT $key, list(rho ORDER BY b) AS rl
                FROM regs GROUP BY 1),
          e AS (SELECT $key,
                       array_to_string(rl, ',') AS regs_csv,
                       CAST(len(list_filter(rl, x -> x = 0)) AS BIGINT)
                         AS n_zero,
                       (CAST(0.7213 AS DOUBLE) / (CAST(1.0 AS DOUBLE) +
                          CAST(1.079 AS DOUBLE) / $mm)) * ${mm.toLong * mm} /
                         list_sum(list_transform(rl, x -> power(0.5, x)))
                         AS e_raw
                FROM s)"""
  }

  /** The estimate presentation over `e` — same floor form as [[est2]]. */
  def estSql(p: Int = 8): String = {
    val mm = m(p)
    s"""floor((CASE WHEN e_raw <= ${2.5 * mm} AND n_zero > 0
                   THEN $mm.0 * ln($mm.0 / n_zero)
                   ELSE e_raw END) * 100.0 + 0.5) / 100.0"""
  }
}
