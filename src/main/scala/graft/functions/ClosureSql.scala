package graft.functions

/** DuckDB-oracle fragment generator: connected components as ITERATIVE
  * min-label propagation with pointer doubling — the replacement for the
  * recursive reach-pair CTE the closure-family oracles used through
  * round 9 (r9 verdict #1). The reach form materializes the full O(n²)
  * reachability relation and re-joins it against the edge set every
  * recursion step, which is CUBIC in clique size: a 20k-member
  * mass-duplication clique at the sf0.1 hostile fuzz tier means ~10¹⁰
  * intermediate rows — the reason those eight oracles had to be excluded
  * from the hostile-tier compare (`GRAFT_FUZZ_SKIP_ORACLES`). This form
  * is O((E+V)·rounds), clique-size-independent, so the hostile tier can
  * run with ZERO oracle skips.
  *
  * Contract: the surrounding query defines a CTE `sym(src, dst)` holding
  * BOTH directions of every edge. This fragment appends CTEs ending in
  * `comp(node, c)` — one row per node appearing in `sym`, c = minimum
  * node id of its connected component — exactly the rows the reach form's
  * `SELECT a, min(b) FROM reach GROUP BY a` produced.
  *
  * Each round r does two steps (Shiloach–Vishkin-style hook + compress):
  *   relax  p_r(v) = min(l_{r-1}(v), min over neighbors u of l_{r-1}(u))
  *   jump   l_r(v) = min(p_r(v), p_r(p_r(v)))
  * Labels are always node ids present in the mapping (the relax UNION ALL
  * carries every node's identity row, and a label is a min over node
  * ids), so the jump's inner self-join is total. The jump at least
  * doubles the distance over which the component minimum has propagated,
  * so `rounds` = 24 converges for any component whose min-label
  * propagation depth is ≤ ~2²⁴ — far beyond any corpus this engine's
  * gates run.
  *
  * Loud-fail contract (the g11 unrolled-k-core pattern): a graph needing
  * more rounds leaves some label above the true component minimum, which
  * hash-mismatches the engine's converged fixed point — the gate fails
  * loud, never silently wrong. Every CTE is MATERIALIZED: DuckDB inlines
  * plain CTEs per reference, and each round's p is referenced twice by
  * its jump and each l twice by the next relax — un-materialized, the
  * chain expands exponentially. */
object ClosureSql {
  /** `prefix` namespaces every CTE (`l0` → `<prefix>l0`, `comp` →
    * `<prefix>comp`) so one oracle can run the chain over two different
    * symmetrized edge sets (g27 needs day-1 AND day-2 components). */
  def minLabelComp(rounds: Int = 24, sym: String = "sym",
      prefix: String = ""): String = {
    require(rounds >= 1, "at least one round")
    val p = prefix
    val init =
      s"""${p}l0 AS MATERIALIZED (
         |  SELECT src AS node, min(lbl) AS lbl FROM (
         |    SELECT src, src AS lbl FROM $sym
         |    UNION ALL SELECT src, dst FROM $sym) ${p}i0
         |  GROUP BY src)""".stripMargin
    val roundSql = (1 to rounds).map { i =>
      s"""${p}p$i AS MATERIALIZED (
         |  SELECT x.node, min(x.lbl) AS lbl FROM (
         |    SELECT node, lbl FROM ${p}l${i - 1}
         |    UNION ALL
         |    SELECT s.src AS node, l.lbl FROM $sym s
         |    JOIN ${p}l${i - 1} l ON s.dst = l.node) x
         |  GROUP BY x.node),
         |${p}l$i AS MATERIALIZED (
         |  SELECT p.node, least(p.lbl, q.lbl) AS lbl
         |  FROM ${p}p$i p JOIN ${p}p$i q ON p.lbl = q.node)""".stripMargin
    }.mkString(",\n")
    s"""$init,
       |$roundSql,
       |${p}comp AS MATERIALIZED (SELECT node, lbl AS c FROM ${p}l$rounds)""".stripMargin
  }
}
