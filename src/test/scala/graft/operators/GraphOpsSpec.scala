package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Hash-to-min connected components: exactness on adversarial topologies
  * and the logarithmic round bound that motivates it (a diameter-bound
  * label propagation would need one round per link on the chain). */
class GraphOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** Runs BOTH execution paths (single-task union-find last mile and the
    * distributed hash-to-min rounds) and asserts they agree before
    * returning the labels. */
  private def cc(edges: Seq[(Long, Long)], maxRounds: Int = 50): Map[Long, Long] = {
    import spark.implicits._
    val local = GraphOps.connectedComponents(edges.toDF("x", "y"), maxRounds)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val dist = GraphOps.connectedComponents(edges.toDF("x", "y"), maxRounds,
        localThreshold = 0L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(local == dist, "local union-find and distributed hash-to-min disagree")
    local
  }

  test("300-node chain collapses to one component within the log-round budget") {
    val chain = (0L until 299L).map(i => (i, i + 1))
    // 2 + ceil(log2(300)) ≈ 11 rounds is ample for hash-to-min; label
    // propagation would need ~299.
    val labels = cc(chain, maxRounds = 15)
    assert(labels.size == 300)
    assert(labels.values.forall(_ == 0L))
  }

  test("cycle, star, and separated components get exact minimum labels") {
    val cycle = (10L until 20L).map(i => (i, if (i == 19) 10L else i + 1))
    val star = (101L to 105L).map(i => (100L, i))
    val pair = Seq((1000L, 2000L))
    val labels = cc(cycle ++ star ++ pair)
    (10L until 20L).foreach(i => assert(labels(i) == 10L))
    (100L to 105L).foreach(i => assert(labels(i) == 100L))
    assert(labels(1000L) == 1000L && labels(2000L) == 1000L)
  }

  test("edge direction does not matter and duplicate edges are harmless") {
    val labels = cc(Seq((5L, 3L), (3L, 5L), (5L, 3L), (7L, 5L)))
    assert(labels == Map(3L -> 3L, 5L -> 3L, 7L -> 3L))
  }

  private def tri(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    import spark.implicits._
    GraphOps.triangleCounts(edges.toDF("x", "y"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("triangle counts: K4, star, path, and a hub with one closed wedge") {
    // K4: every vertex sits in C(3,2) = 3 triangles
    val k4 = for (a <- 0L to 3L; b <- (a + 1) to 3L) yield (a, b)
    assert(tri(k4) == Map(0L -> 3L, 1L -> 3L, 2L -> 3L, 3L -> 3L))
    // star and path are triangle-free -> empty output
    assert(tri((1L to 5L).map(i => (0L, i))).isEmpty)
    assert(tri((0L until 5L).map(i => (i, i + 1))).isEmpty)
    // high-degree hub with exactly ONE closed wedge: the degree-ordered
    // orientation must count it once (at the triangle's lowest-degree
    // vertex) and credit all three corners
    val hub = (1L to 20L).map(i => (0L, i)) :+ (1L, 2L)
    assert(tri(hub) == Map(0L -> 1L, 1L -> 1L, 2L -> 1L))
  }

  test("triangle counts: overlapping triangles share edges correctly") {
    // two triangles glued on edge (1,2): nodes 1,2 in two, nodes 3,4 in one
    val glued = Seq((1L, 2L), (1L, 3L), (2L, 3L), (1L, 4L), (2L, 4L))
    assert(tri(glued) == Map(1L -> 2L, 2L -> 2L, 3L -> 1L, 4L -> 1L))
  }
}
