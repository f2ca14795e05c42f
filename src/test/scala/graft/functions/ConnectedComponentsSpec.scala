package graft.functions

import graft.SparkSuite

import scala.collection.mutable

/** Convergence + correctness of the large-star/small-star components. */
class ConnectedComponentsSpec extends SparkSuite {

  /** Union-find model: larger root always attaches under smaller, so each
    * root IS the component minimum — the same labeling CC must produce.
    */
  private def ccModel(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    edges.flatMap(e => Seq(e._1, e._2)).distinct
      .filter(x => edges.exists(e => e._1 != e._2 && (e._1 == x || e._2 == x)))
      .map(x => x -> find(x)).toMap
  }

  private def ccSpark(edges: Seq[(Long, Long)]): (Map[Long, Long], Int) = {
    import spark.implicits._
    val (df, rounds) = ConnectedComponents.labelsAndRounds(edges.toDF("a", "b"))
    (df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap, rounds)
  }

  test("a 64-node chain converges to the min label in O(log n) rounds") {
    val edges = (0L until 63L).map(i => (i + 1, i))
    val (labels, rounds) = ccSpark(edges)
    assert(labels == (0L to 63L).map(_ -> 0L).toMap)
    assert(rounds <= 10, s"expected logarithmic convergence, took $rounds rounds")
  }

  test("multiple components, cycles, self-loops, duplicate edges") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 3L), (2L, 1L),
      (10L, 20L), (20L, 30L), (40L, 40L))
    val (labels, _) = ccSpark(edges)
    // 40 has only a self-loop → not a member of any edge → absent
    assert(labels == Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      10L -> 10L, 20L -> 10L, 30L -> 10L))
  }

  test("empty edge set converges immediately") {
    import spark.implicits._
    val (df, rounds) =
      ConnectedComponents.labelsAndRounds(Seq.empty[(Long, Long)].toDF("a", "b"))
    assert(df.count() == 0L && rounds == 0)
  }

  test("random graphs match the union-find model") {
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 3) {
      val edges = Seq.fill(60)(
        (rnd.nextInt(80).toLong, rnd.nextInt(80).toLong)).filter(e => e._1 != e._2)
      val (got, _) = ccSpark(edges)
      assert(got == ccModel(edges), s"trial $trial diverged from the model")
    }
  }
}
