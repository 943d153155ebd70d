package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** Connected components: algorithm output must equal a reference
  * union-find on every graph shape that breaks naive approaches —
  * transitive chains (the pair-drop over-keep case), cycles, stars,
  * and random graphs.
  */
class ConnectedComponentsSpec extends AnyFunSuite {
  lazy val spark = graft.TestSpark.spark
  import spark.implicits._

  private def unionFind(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
    nodes.map(n => n -> find(n)).toMap
  }

  private def ccOf(edges: Seq[(Long, Long)]): Map[Long, Long] =
    ConnectedComponents.components(edges.toDF("a", "b"), "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("transitive chain: {5-10, 1-10} is ONE cluster with min 1") {
    assert(ccOf(Seq((5L, 10L), (1L, 10L))) ==
      Map(1L -> 1L, 5L -> 1L, 10L -> 1L))
  }

  test("long path graph (worst case for label propagation)") {
    val path = (0L until 63L).map(i => (i, i + 1))
    val got = ccOf(path)
    assert(got.size == 64 && got.values.forall(_ == 0L), got.toString)
  }

  test("cycles, self-loops and duplicate/reversed edges") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 3L), (2L, 1L),
      (10L, 11L), (11L, 10L))
    val got = ccOf(edges)
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L))
  }

  test("random graphs match a reference union-find") {
    val rnd = new scala.util.Random(42)
    (1 to 3).foreach { _ =>
      val edges = Seq.fill(300)((rnd.nextInt(120).toLong, rnd.nextInt(120).toLong))
        .filter(e => e._1 != e._2)
      assert(ccOf(edges) == unionFind(edges))
    }
  }

  test("dedupByComponents keeps exactly one row per cluster (chain case)") {
    val docs = Seq((1L, "a"), (5L, "b"), (10L, "c"), (99L, "solo"))
      .toDF("id", "text")
    val pairs = Seq((5L, 10L), (1L, 10L)).toDF("id_a", "id_b")
    val kept = ConnectedComponents
      .dedupByComponents(docs, "id", pairs, "id_a", "id_b")
      .select("id").collect().map(_.getLong(0)).sorted
    // pair-drop would keep {1, 5, 99}: 5 never appears as a larger id.
    // cluster semantics keep the component min only: {1, 99}.
    assert(kept.toSeq == Seq(1L, 99L))
  }
}
