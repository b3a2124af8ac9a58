package graft

import graft.operators.GraphOps
import graft.sources.EdgeList
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.funsuite.AnyFunSuite

/** Unit + oracle tests for the graph surface (SURVEY.md §5).
  *
  * Micro-graphs are hand-computable; 50.txt parity uses an independent
  * in-memory O(n³)-ish enumeration as the oracle (the reference repo
  * publishes no expected outputs).
  */
class GraphOpsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkTestSession.get
  import spark.implicits._

  private def edgesDF(es: Seq[(Long, Long)]): DataFrame = es.toDF("src", "dst")

  private def triSet(df: DataFrame): Set[(Long, Long, Long)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

  /** Independent oracle: brute-force triangle enumeration over a hash set. */
  private def bruteTriangles(es: Seq[(Long, Long)]): Set[(Long, Long, Long)] = {
    val undirected = es.filter(e => e._1 != e._2)
      .map(e => (math.min(e._1, e._2), math.max(e._1, e._2))).toSet
    val nodes = undirected.flatMap(e => Seq(e._1, e._2)).toSeq.sorted
    (for {
      a <- nodes; b <- nodes if a < b && undirected((a, b))
      c <- nodes if b < c && undirected((a, c)) && undirected((b, c))
    } yield (a, b, c)).toSet
  }

  test("K3 yields exactly its one triangle (the §2.9 regression property)") {
    assert(triSet(GraphOps.triangles(edgesDF(Seq((1L, 2L), (2L, 3L), (1L, 3L))))) ===
      Set((1L, 2L, 3L)))
  }

  test("K4 yields 4 triangles") {
    val k4 = for (a <- 1L to 4L; b <- (a + 1) to 4L) yield (a, b)
    assert(triSet(GraphOps.triangles(edgesDF(k4))) ===
      Set((1L, 2L, 3L), (1L, 2L, 4L), (1L, 3L, 4L), (2L, 3L, 4L)))
  }

  test("path graph has no triangles") {
    assert(triSet(GraphOps.triangles(edgesDF(Seq((1L, 2L), (2L, 3L), (3L, 4L))))).isEmpty)
  }

  test("multi-edges and reversed duplicates don't duplicate triangles") {
    val es = Seq((1L, 2L), (2L, 1L), (1L, 2L), (2L, 3L), (1L, 3L), (3L, 1L))
    assert(triSet(GraphOps.triangles(edgesDF(es))) === Set((1L, 2L, 3L)))
  }

  test("self-loops never form degenerate triangles") {
    val es = Seq((1L, 1L), (1L, 2L), (2L, 3L), (1L, 3L), (2L, 2L))
    assert(triSet(GraphOps.triangles(edgesDF(es))) === Set((1L, 2L, 3L)))
  }

  test("node id 0 is a normal node (no sentinel reservation, unlike the reference)") {
    assert(triSet(GraphOps.triangles(edgesDF(Seq((0L, 1L), (1L, 2L), (0L, 2L))))) ===
      Set((0L, 1L, 2L)))
  }

  test("disconnected components are independent") {
    val es = Seq((1L, 2L), (2L, 3L), (1L, 3L), (10L, 11L), (11L, 12L), (10L, 12L))
    assert(triSet(GraphOps.triangles(edgesDF(es))).size === 2)
  }

  test("degrees on K3 plus a pendant edge") {
    val d = GraphOps.degrees(edgesDF(Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L))))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(d === Map(1L -> 2L, 2L -> 2L, 3L -> 3L, 4L -> 1L))
  }

  test("common neighbors: square 1-2-3-4 has cn(1,3)=cn(2,4)=2") {
    val sq = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L))
    val cn = GraphOps.commonNeighbors(edgesDF(sq), minCommon = 2)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    assert(cn === Map((1L, 3L) -> 2L, (2L, 4L) -> 2L))
  }

  test("node triangle counts on K4: every node in 3 triangles") {
    val k4 = for (a <- 1L to 4L; b <- (a + 1) to 4L) yield (a, b)
    val counts = GraphOps.nodeTriangleCounts(edgesDF(k4))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(counts === Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
  }

  test("adjacency lists are sorted distinct neighbors") {
    val adj = GraphOps.adjacency(edgesDF(Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 1L))))
      .collect().map(r => (r.getLong(0), r.getSeq[Long](1))).toMap
    assert(adj === Map(1L -> Seq(2L, 3L), 2L -> Seq(1L, 3L), 3L -> Seq(1L, 2L)))
  }

  test("commonNeighbors degree cap excludes wedges through hubs") {
    // star: hub 0 connects 1,2,3; plus edge 1-4 making node 1 degree 2
    val star = Seq((0L, 1L), (0L, 2L), (0L, 3L), (1L, 4L))
    val uncapped = GraphOps.commonNeighbors(edgesDF(star), minCommon = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(uncapped === Set((1L, 2L), (1L, 3L), (2L, 3L), (0L, 4L)))
    // cap 2 removes the hub (degree 3): only wedges via low-degree nodes stay
    val capped = GraphOps.commonNeighbors(edgesDF(star), minCommon = 1, maxDegree = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(capped === Set((0L, 4L)))
  }

  test("50.txt parity with independent brute-force oracle") {
    val path = "/root/reference/src/main/resources/50.txt"
    val df = EdgeList.read(spark, path)
    val es = df.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(es.length === 50)
    assert(triSet(GraphOps.triangles(df)) === bruteTriangles(es))
  }

  test("invariance: permutation + direction flips + duplicate injection") {
    val rnd = new scala.util.Random(42)
    val base = Seq.fill(60)((rnd.nextInt(12).toLong, rnd.nextInt(12).toLong))
    val expected = bruteTriangles(base)
    val perturbed = rnd.shuffle(
      base.map { case (u, v) => if (rnd.nextBoolean()) (v, u) else (u, v) } ++
        base.take(15))
    assert(triSet(GraphOps.triangles(edgesDF(perturbed))) === expected)
  }
}
