package graft.queries

import graft.SparkSuite

/** Planted-duplicate fixture for dedup_semantic: the natural corpus only
  * exercises the incidental high-cosine tail, so the oracle match alone
  * never shows a REAL near-duplicate being caught. Here the corpus is
  * near-orthogonal by construction (distinct one-hot-ish vectors, all
  * pairwise cosines ~0.01) with two planted duplicates — one exact copy
  * (identical LSH signature, so band blocking provably cannot miss it)
  * and one noisy copy — and the spec pins the catch, the min-id keeper
  * rule, and zero false positives.
  */
class SemanticFixtureSpec extends SparkSuite {
  import spark.implicits._

  // 40 base vectors, ids 100..139 (so the fixed centroid sample
  // [100, 116) exists): vector i = 1.0 at dim i%64 + 0.01 at a second
  // dim — distinct primary dims, pairwise cosine ≈ 1e-4
  private def base(i: Int): Array[Float] = {
    val v = Array.fill(64)(0.0f)
    v(i % 64) = 1.0f
    v((i * 7 + 3) % 64) = 0.01f
    v
  }

  private val planted: Seq[(Long, Array[Float])] = {
    val exact = base(121) // copy of id 121, bit-identical
    val noisy = base(125).clone() // copy of id 125 + tiny extra component
    noisy((125 * 11 + 5) % 64) = noisy((125 * 11 + 5) % 64) + 0.001f
    Seq(500L -> exact, 501L -> noisy)
  }

  test("planted duplicates are caught, keepers follow the min-id rule, no false positives") {
    val emb = ((100 until 140).map(i => i.toLong -> base(i)) ++ planted)
      .toDF("vec_id", "embedding")
    val out = DedupOps.semanticDedup(emb)
      .select($"vec_id", $"cid", $"dup_of", $"n_dups")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), if (r.isNullAt(2)) None else Some(r.getLong(2)), r.getLong(3)))
      .toMap

    // verdict is total: one row per input vector
    assert(out.size == 42, s"expected 42 rows, got ${out.size}")

    // the exact copy shares id 121's signature — band blocking provably
    // finds it — and the min-id rule keeps 121, drops 500
    assert(out(500L)._2 == Some(121L), s"exact copy verdict: ${out(500L)}")
    assert(out(121L)._2 == None, "the lower-id original must be the keeper")
    // both land in the same cluster by construction
    assert(out(500L)._1 == out(121L)._1)

    // the noisy copy (cosine ~0.9999) is caught the same way
    assert(out(501L)._2 == Some(125L), s"noisy copy verdict: ${out(501L)}")
    assert(out(125L)._2 == None)
    assert(out(501L)._1 == out(125L)._1)

    // near-orthogonal corpus: nobody else is flagged (no false positives
    // from the 0.35 threshold), and every dup_of points at a LOWER id
    val others = out.view.filterKeys(k => k != 500L && k != 501L)
    assert(others.forall { case (_, (_, d, n)) => d.isEmpty && n == 0L },
      s"false positives: ${others.filter(_._2._2.nonEmpty).toMap}")
    out.foreach { case (id, (_, d, _)) => d.foreach(p => assert(p < id)) }
  }

  test("self-similarity: an exact duplicate of a CENTROID vector is still deduped") {
    // the copy of centroid 105 assigns to cluster 105 (score tie broken
    // by cid, both get the same argmin) and pairs with it
    val emb = ((100 until 140).map(i => i.toLong -> base(i))
      :+ (700L -> base(105))).toDF("vec_id", "embedding")
    val out = DedupOps.semanticDedup(emb)
      .select($"vec_id", $"dup_of").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1))))
      .toMap
    assert(out(700L) == Some(105L), s"centroid copy verdict: ${out(700L)}")
    assert(out(105L).isEmpty)
  }
}
