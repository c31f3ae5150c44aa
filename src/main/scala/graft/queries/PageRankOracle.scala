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
    * [[graft.graph.PageRank.run]]'s `redistributeDangling = true`.
    * @param personalized replays `teleportTo = Some(min src)`: r0 is
    * the source page's indicator vector and the teleport term is
    * 0.15·[page = src] instead of 0.15/N (the psrc CTE picks MIN(src)
    * FROM good — the same deterministic choice the catalog query
    * collects). Mutually exclusive with `redistribute`, like the
    * engine parameter.
    * @param weighted replays `PageRank.run(weightCol = Some("w"))`:
    * callers' graphCtes must define `good(src, dst, w)`; deg becomes
    * Σw per source and the mass term `r.pr * g.w / d.deg` — the same
    * double expression tree as the engine's `rank * w / deg`. */
  def sql(graphCtes: String, iters: Int, select: String,
          redistribute: Boolean = false,
          personalized: Boolean = false,
          weighted: Boolean = false): String = {
    require(!(redistribute && personalized),
      "personalized + redistribute is not supported (mirrors PageRank.run)")
    val iterCtes = (1 to iters).map { k =>
      // bit-parity with the Spark update: the redistribute form groups as
      // 0.85 * (mass + dm/n), NOT 0.85*mass + 0.85*dm/n (fp association)
      val update =
        if (personalized)
          """CASE WHEN p.page = (SELECT s FROM psrc) THEN 0.15 ELSE 0.0 END
               + 0.85 * COALESCE(m.mass, 0)"""
        else if (!redistribute) "0.15 / (SELECT n FROM nn) + 0.85 * COALESCE(m.mass, 0)"
        else s"""0.15 / (SELECT n FROM nn) + 0.85 * (COALESCE(m.mass, 0) +
                   (SELECT COALESCE(SUM(pr), 0) FROM r${k - 1}
                    WHERE page NOT IN (SELECT src FROM good)) / (SELECT n FROM nn))"""
      // MATERIALIZED: DuckDB inlines plain CTEs per REFERENCE, and the
      // redistribute form references r_{k-1} twice (mass join + dangling
      // scalar) — inlined, the 8-iteration chain re-evaluates 2^k times
      // (observed: a 66 GB spill at sf0.1 before the oracle died);
      // materialized, each iteration computes once. Evaluation hint
      // only — results identical (same class as the q_text_pack fix).
      val massTerm = if (weighted) "r.pr * g.w / d.deg" else "r.pr / d.deg"
      s"""r$k AS MATERIALIZED (
            SELECT p.page,
                   $update AS pr
            FROM pages p LEFT JOIN (
              SELECT g.dst, SUM($massTerm) AS mass
              FROM good g
              JOIN r${k - 1} r ON g.src = r.page
              JOIN deg d ON g.src = d.src
              GROUP BY g.dst) m ON p.page = m.dst)"""
    }.mkString(",\n")
    val r0 =
      if (personalized)
        """r0 AS (SELECT page,
                    CASE WHEN page = (SELECT s FROM psrc)
                         THEN 1.0 ELSE 0.0 END AS pr FROM pages)"""
      else "r0 AS (SELECT page, 1.0 / (SELECT n FROM nn) AS pr FROM pages)"
    val psrc =
      if (personalized) "psrc AS (SELECT MIN(src) AS s FROM good),\n" else ""
    val degCte =
      if (weighted)
        """deg AS (SELECT src, CAST(SUM(w) AS DOUBLE) AS deg
                   FROM good GROUP BY src)"""
      else
        """deg AS (SELECT src, CAST(COUNT(*) AS DOUBLE) AS deg
                   FROM good GROUP BY src)"""
    s"""WITH $graphCtes,
        $degCte,
        nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM pages),
        $psrc$r0,
        $iterCtes
        $select"""
  }

  /** One unrolled reference-convention iteration chain
    * `${p}1..${p}$iters` over edge CTE `$good` and degree CTE `$deg`,
    * seeded from a caller-provided `${p}0` — the warm-start oracle's
    * building block (same update text as [[sql]]'s plain form, same
    * MATERIALIZED rationale). */
  private def chainCtes(p: String, good: String, deg: String,
      iters: Int, pages: String = "pages", nn: String = "nn"): String =
    (1 to iters).map { k =>
      s"""$p$k AS MATERIALIZED (
            SELECT p.page,
                   0.15 / (SELECT n FROM $nn) + 0.85 * COALESCE(m.mass, 0) AS pr
            FROM $pages p LEFT JOIN (
              SELECT g.dst, SUM(r.pr / d.deg) AS mass
              FROM $good g
              JOIN $p${k - 1} r ON g.src = r.page
              JOIN $deg d ON g.src = d.src
              GROUP BY g.dst) m ON p.page = m.dst)"""
    }.mkString(",\n")

  /** WARM-START replay (q_pagerank_incremental): `standIters`
    * reference-convention iterations over the STANDING edge set
    * (callers' graphCtes must define `sgood(src, dst)` next to the
    * full `good`), whose final vector seeds `warmIters` iterations
    * over the full set — one statement states the standing store AND
    * the warm re-run, so a wrong store or a wrong seed
    * hash-mismatches. The select reads `w$warmIters`. */
  def warmSql(graphCtes: String, standIters: Int, warmIters: Int,
      select: String): String =
    s"""WITH $graphCtes,
        deg AS (SELECT src, CAST(COUNT(*) AS DOUBLE) AS deg
                FROM good GROUP BY src),
        sdeg AS (SELECT src, CAST(COUNT(*) AS DOUBLE) AS deg
                 FROM sgood GROUP BY src),
        nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM pages),
        s0 AS (SELECT page, 1.0 / (SELECT n FROM nn) AS pr FROM pages),
        ${chainCtes("s", "sgood", "sdeg", standIters)},
        w0 AS (SELECT page, pr FROM s$standIters),
        ${chainCtes("w", "good", "deg", warmIters)}
        $select"""

  /** TWICE-WARMED replay (q_pagerank_inc2 — round-19 re-entrancy):
    * `standIters` iterations over the STANDING edge set seed
    * `warm1Iters` iterations over the MID edge set (callers' graphCtes
    * must define `mgood(src, dst)` — the graph at the advanced mark —
    * next to `sgood` and `good`), whose final vector seeds
    * `warm2Iters` iterations over the full set. ONE statement states
    * the standing store, the intermediate store, and both warm
    * re-runs: a mark that failed to advance, a store written lossily,
    * or a seed read from the wrong side hash-mismatches. The select
    * reads `w$warm2Iters`. */
  def warm2Sql(graphCtes: String, standIters: Int, warm1Iters: Int,
      warm2Iters: Int, select: String): String =
    s"""WITH $graphCtes,
        deg AS (SELECT src, CAST(COUNT(*) AS DOUBLE) AS deg
                FROM good GROUP BY src),
        sdeg AS (SELECT src, CAST(COUNT(*) AS DOUBLE) AS deg
                 FROM sgood GROUP BY src),
        mdeg AS (SELECT src, CAST(COUNT(*) AS DOUBLE) AS deg
                 FROM mgood GROUP BY src),
        nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM pages),
        s0 AS (SELECT page, 1.0 / (SELECT n FROM nn) AS pr FROM pages),
        ${chainCtes("s", "sgood", "sdeg", standIters)},
        m0 AS (SELECT page, pr FROM s$standIters),
        ${chainCtes("m", "mgood", "mdeg", warm1Iters)},
        w0 AS (SELECT page, pr FROM m$warm1Iters),
        ${chainCtes("w", "good", "deg", warm2Iters)}
        $select"""

  /** WARM-AFTER-DELETE replay (q_graph_delete — the graph family's
    * tombstone leg): `standIters` iterations over the STANDING edge
    * set (callers' graphCtes must define `sgood` over `pages`), then
    * the standing vector RESTRICTED to the survivor page set seeds
    * `warmIters` iterations over the survivor graph — callers define
    * `pages2` (the pages the takedown keeps) and `gdel` (the standing
    * edges with both endpoints surviving). The survivor chain's
    * teleport uses the SURVIVOR count (nn2): removing a vertex changes
    * N, exactly as the engine's PageRank.run recounts the page set it
    * is given. The select reads `w$warmIters`. */
  def warmDeleteSql(graphCtes: String, standIters: Int, warmIters: Int,
      select: String): String =
    s"""WITH $graphCtes,
        sdeg AS (SELECT src, CAST(COUNT(*) AS DOUBLE) AS deg
                 FROM sgood GROUP BY src),
        ddeg AS (SELECT src, CAST(COUNT(*) AS DOUBLE) AS deg
                 FROM gdel GROUP BY src),
        nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM pages),
        nn2 AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM pages2),
        s0 AS (SELECT page, 1.0 / (SELECT n FROM nn) AS pr FROM pages),
        ${chainCtes("s", "sgood", "sdeg", standIters)},
        w0 AS (SELECT page, pr FROM s$standIters
               WHERE page IN (SELECT page FROM pages2)),
        ${chainCtes("w", "gdel", "ddeg", warmIters, "pages2", "nn2")}
        $select"""

  /** MAINTENANCE-DECISION replay (q_pagerank_maintain): the warm
    * chains of [[warmSql]] PLUS a cold chain `c1..c$coldIters`
    * (uniform seed over the full graph) and a `churn` CTE (the
    * directed new-edge fraction over `dgood`/`dsgood`, which callers'
    * graphCtes must define) — one statement carries BOTH branches and
    * the decision, the q_ann_maintain oracle shape. */
  def maintainSql(graphCtes: String, standIters: Int, warmIters: Int,
      coldIters: Int, select: String): String =
    s"""WITH $graphCtes,
        deg AS (SELECT src, CAST(COUNT(*) AS DOUBLE) AS deg
                FROM good GROUP BY src),
        sdeg AS (SELECT src, CAST(COUNT(*) AS DOUBLE) AS deg
                 FROM sgood GROUP BY src),
        nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM pages),
        churn AS (SELECT CAST((SELECT COUNT(*) FROM dgood) -
                              (SELECT COUNT(*) FROM dsgood) AS DOUBLE) /
                         CAST((SELECT COUNT(*) FROM dsgood) AS DOUBLE)
                    AS cf),
        s0 AS (SELECT page, 1.0 / (SELECT n FROM nn) AS pr FROM pages),
        ${chainCtes("s", "sgood", "sdeg", standIters)},
        w0 AS (SELECT page, pr FROM s$standIters),
        ${chainCtes("w", "good", "deg", warmIters)},
        c0 AS (SELECT page, 1.0 / (SELECT n FROM nn) AS pr FROM pages),
        ${chainCtes("c", "good", "deg", coldIters)}
        $select"""
}
