package graft.queries

import graft.SparkSuite

/** shuffle_deterministic's contract: the permutation is a pure function
  * of (seed, doc_id) — re-running the query yields the IDENTICAL order
  * (what makes a training run resumable mid-epoch), and the positions
  * are a dense 1..N permutation.
  */
class ShuffleDeterminismSpec extends SparkSuite {
  import spark.implicits._

  private def run(): Map[Long, Long] =
    graft.SparkEntry.queries("shuffle_deterministic")(spark, sf())
      .select($"doc_id", $"pos")
      .as[(Long, Long)].collect().toMap

  test("re-runs produce the identical permutation, dense over 1..N") {
    val first = run()
    val second = run() // a fresh plan + fresh shuffle, not a cache read
    assert(first == second, "re-run moved documents")
    assert(first.values.toSeq.sorted == (1L to first.size.toLong),
      "positions are not a dense 1..N permutation")
    // and it actually permutes: the order must not be the identity
    val moved = first.count { case (id, pos) => pos != id + 1 }
    assert(moved > first.size / 2, s"only $moved of ${first.size} docs moved")
  }
}
