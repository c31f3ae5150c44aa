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

  /** @param redistribute adds the standard dangling-mass term: each
    * iteration also receives 0.85 · (Σ rank of zero-out-degree pages)/N,
    * so total rank stays 1 — replays
    * [[graft.graph.PageRank.run]]'s `redistributeDangling = true`. */
  def sql(graphCtes: String, iters: Int, select: String,
          redistribute: Boolean = false): String = {
    val iterCtes = (1 to iters).map { k =>
      // bit-parity with the Spark update: the redistribute form groups as
      // 0.85 * (mass + dm/n), NOT 0.85*mass + 0.85*dm/n (fp association)
      val update =
        if (!redistribute) "0.15 / (SELECT n FROM nn) + 0.85 * COALESCE(m.mass, 0)"
        else s"""0.15 / (SELECT n FROM nn) + 0.85 * (COALESCE(m.mass, 0) +
                   (SELECT COALESCE(SUM(pr), 0) FROM r${k - 1}
                    WHERE page NOT IN (SELECT src FROM good)) / (SELECT n FROM nn))"""
      s"""r$k AS (
            SELECT p.page,
                   $update AS pr
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
