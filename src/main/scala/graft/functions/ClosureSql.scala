package graft.functions

/** DuckDB-oracle fragment generator: connected components as UNROLLED
  * LARGE-STAR/SMALL-STAR contraction — the same alternation the engine's
  * own `connectedComponentsStar` runs, and the replacement for two prior
  * oracle forms that each failed a fuzz tier:
  *
  *   - the recursive reach-pair CTE (rounds ≤ 9) materializes the full
  *     O(n²) reachability relation — CUBIC in clique size on the
  *     mass-duplication hostile tier (r9 verdict #1);
  *   - the round-13/14 iterative min-label relax + pointer-jump unroll
  *     is clique-safe but Θ(path length) on sparse graphs: the "jump"
  *     goes to the min node id of the covered ball, which is not
  *     forward progress under adversarial/random id placement, so the
  *     component minimum still crosses local-min basins one RELAX hop
  *     per round. Hostile fuzz seed 132 produced a 1387-node near-tree
  *     derived graph needing 32 rounds against the unrolled 24 — the
  *     oracle under-converged while the ENGINE was right (measured:
  *     extra pointer squarings do not help; a 4000-node random-id path
  *     needs ~1125 rounds in that family).
  *
  * Star contraction has neither failure mode: each round is O(E) and
  * the alternation contracts every component to a star in O(log² n)
  * rounds with ~log₂(n) observed (measured here: 7 rounds on the
  * seed-132 graph, 9 on a shuffled 60k binary tree, 13 on a 60k
  * random-id path — the worst family — and 2 on cliques), so the
  * unrolled 24 rounds carry ~11 doublings of slack over the worst
  * measured gate-scale graph.
  *
  * Contract (unchanged): the surrounding query defines a CTE
  * `sym(src, dst)` holding BOTH directions of every edge (no self
  * loops). This fragment appends CTEs ending in `comp(node, c)` — one
  * row per node appearing in `sym`, c = minimum node id of its
  * connected component.
  *
  * Round structure (mirrors `GraphOps.connectedComponentsStar`, on
  * canonical big-first pairs e(u, v), u > v):
  *
  *   large-star: every node attaches its LARGER neighbors to the min of
  *   its symmetric neighborhood (incl. itself) — emitted pairs are
  *   (bigger v, min m), canonical by construction;
  *   small-star: every node attaches its smaller neighbors (and itself)
  *   to their min — collapses the chains large-star leaves.
  *
  * At the fixed point e is exactly the star forest
  * {(v, component-min) : v not a root}; labels read off as min(v) per u
  * with roots defaulting to themselves.
  *
  * Loud-fail contract (the g11 unrolled-k-core pattern): a graph needing
  * more rounds leaves some label above the true component minimum, which
  * hash-mismatches the engine's CONVERGED fixed point — the gate fails
  * loud, never silently wrong. Every CTE is MATERIALIZED: DuckDB inlines
  * plain CTEs per reference, and each round's intermediates are
  * referenced twice — un-materialized, the chain expands exponentially. */
object ClosureSql {
  /** `prefix` namespaces every CTE (`e0` → `<prefix>e0`, `comp` →
    * `<prefix>comp`) so one oracle can run the chain over two different
    * symmetrized edge sets (g27 needs day-1 AND day-2 components). */
  def minLabelComp(rounds: Int = 24, sym: String = "sym",
      prefix: String = ""): String = {
    require(rounds >= 1, "at least one round")
    val p = prefix
    val init =
      s"""${p}e0 AS MATERIALIZED (
         |  SELECT DISTINCT greatest(src, dst) AS u, least(src, dst) AS v
         |  FROM $sym WHERE src <> dst)""".stripMargin
    val roundSql = (1 to rounds).map { i =>
      // large-star: symmetrize, per-node min (incl. self), attach the
      // LARGER end of every sym pair to the smaller end's min
      s"""${p}ls$i AS MATERIALIZED (
         |  SELECT u, v FROM ${p}e${i - 1}
         |  UNION ALL SELECT v, u FROM ${p}e${i - 1}),
         |${p}lm$i AS MATERIALIZED (
         |  SELECT u AS n, least(min(v), u) AS m FROM ${p}ls$i GROUP BY u),
         |${p}el$i AS MATERIALIZED (
         |  SELECT s.v AS u, l.m AS v FROM ${p}ls$i s
         |  JOIN ${p}lm$i l ON s.u = l.n
         |  WHERE s.v > s.u),
         |${p}sm$i AS MATERIALIZED (
         |  SELECT u AS n, min(v) AS m FROM ${p}el$i GROUP BY u),
         |${p}e$i AS MATERIALIZED (
         |  SELECT DISTINCT u, v FROM (
         |    SELECT e.v AS u, s.m AS v FROM ${p}el$i e
         |    JOIN ${p}sm$i s ON e.u = s.n WHERE e.v <> s.m
         |    UNION ALL
         |    SELECT s.n AS u, s.m AS v FROM ${p}sm$i s) ${p}t$i)""".stripMargin
    }.mkString(",\n")
    s"""$init,
       |$roundSql,
       |${p}nodes AS MATERIALIZED (SELECT DISTINCT src AS node FROM $sym),
       |${p}lab AS MATERIALIZED (
       |  SELECT u AS node, min(v) AS c FROM ${p}e$rounds GROUP BY u),
       |${p}comp AS MATERIALIZED (
       |  SELECT n.node, coalesce(l.c, n.node) AS c
       |  FROM ${p}nodes n LEFT JOIN ${p}lab l ON l.node = n.node)""".stripMargin
  }
}
