package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The shared p=8 HLL estimate path — ONE copy of the float-sensitive
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
  * All expressions read a `regs` column: the 256-register array
  * emitted by [[graft.functions.HllAgg]](8).
  */
private[queries] object HllShared {

  /** Raw estimate alpha·m²/Σ2⁻ʳ (Flajolet'07), m = 256. */
  val eRaw: Column = expr(
    "(CAST(0.7213 AS DOUBLE) / (CAST(1.0 AS DOUBLE) + " +
      "CAST(1.079 AS DOUBLE) / 256)) * 65536 / " +
      "aggregate(regs, CAST(0.0 AS DOUBLE), " +
      "(acc, r) -> acc + power(0.5, r))")

  /** Empty-register count (drives the linear-counting fallback). */
  val nZero: Column = expr("size(filter(regs, r -> r = 0))").cast("long")

  /** Bias-corrected estimate at 2 decimals: linear counting below the
    * 2.5·m threshold, floor-form presentation (see scaladoc above). */
  def est2: Column = {
    val est = when(eRaw <= 640.0 && nZero > 0,
      lit(256.0) * log(lit(256.0) / nZero)).otherwise(eRaw)
    floor(est * lit(100.0) + lit(0.5)) / lit(100.0)
  }

  /** Oracle CTE chain `w, r, grid, regs, s, e` rebuilding the register
    * array and raw estimate per `key` over `src(key, hv)` — hv the
    * 60-bit md5 hash, same bucket/rho integer functions as the
    * aggregator. Callers SELECT from `e(key, regs_csv, n_zero, e_raw)`
    * and present the estimate with [[estSql]]. */
  def oracleCtes(key: String, src: String): String =
    s"""w AS (SELECT $key, hv % 256 AS b, hv // 256 AS wv FROM $src),
          r AS (SELECT $key, b,
                       MAX(CASE WHEN wv = 0 THEN 53
                                ELSE 53 - length(bin(wv)) END) AS rho
                FROM w GROUP BY 1, 2),
          grid AS (SELECT DISTINCT g0.$key, mr.range AS b
                   FROM $src g0 CROSS JOIN range(0, 256) mr),
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
                          CAST(1.079 AS DOUBLE) / 256)) * 65536 /
                         list_sum(list_transform(rl, x -> power(0.5, x)))
                         AS e_raw
                FROM s)"""

  /** The estimate presentation over `e` — same floor form as [[est2]]. */
  val estSql: String =
    """floor((CASE WHEN e_raw <= 640.0 AND n_zero > 0
                   THEN 256.0 * ln(256.0 / n_zero)
                   ELSE e_raw END) * 100.0 + 0.5) / 100.0"""
}
