package graft.queries

/** Shared DuckDB oracle builder: reference-convention PageRank unrolled
  * to chained CTEs (DuckDB's recursive CTEs can't aggregate in the
  * recursive term). Callers supply graph CTEs defining `pages(page)` and
  * `good(src, dst)` (the cleaned edge set).
  *
  * Recurrence (matches /root/reference/src/PageRank/PageRank.java:
  * 259, 305-316): r0 = 1/N; r_k = 0.15/N + 0.85 · Σ_in r_{k-1}(src)/deg(src);
  * dangling mass lost (no redistribution term).
  */
object PageRankOracle {

  def sql(graphCtes: String, iters: Int, select: String): String = {
    val iterCtes = (1 to iters).map { k =>
      s"""r$k AS (
            SELECT p.page,
                   0.15 / (SELECT n FROM nn) + 0.85 * COALESCE(m.mass, 0) AS pr
            FROM pages p LEFT JOIN (
              SELECT g.dst, SUM(r.pr / d.deg) AS mass
              FROM good g
              JOIN r${k - 1} r ON g.src = r.page
              JOIN deg d ON g.src = d.src
              GROUP BY g.dst) m ON p.page = m.dst)"""
    }.mkString(",\n")
    s"""WITH $graphCtes,
        deg AS (SELECT src, CAST(COUNT(*) AS DOUBLE) AS deg
                FROM good GROUP BY src),
        nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM pages),
        r0 AS (SELECT page, 1.0 / (SELECT n FROM nn) AS pr FROM pages),
        $iterCtes
        $select"""
  }
}
