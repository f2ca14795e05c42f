package graft.functions

import org.apache.spark.unsafe.types.UTF8String

import graft.SparkSuite

/** Merge-table BPE: the kernel vs an independent one-merge-at-a-time
  * model (the exact formulation the DuckDB oracle executes — pinning this
  * equivalence on random inputs is what licenses the recursive-CTE
  * oracle of `text_bpe_merges`), table well-formedness validation,
  * trainer determinism, and the Catalyst expression end-to-end.
  * Random inputs are seeded (deterministic across runs).
  */
class BpeSpec extends SparkSuite {

  /** Model: ONE merge per step — leftmost occurrence of the lowest-rank
    * adjacent pair — written independently of Bpe's all-at-once scan. */
  private def oneAtATime(word: String, merges: IndexedSeq[(String, String)]): Seq[String] = {
    val rank = merges.zipWithIndex.toMap
    var toks: Vector[String] = word.map(String.valueOf(_)).toVector :+ Bpe.EndOfWord
    var done = false
    while (!done) {
      val ranked = toks.indices.dropRight(1)
        .flatMap(i => rank.get((toks(i), toks(i + 1))).map(r => (r, i)))
      if (ranked.isEmpty) done = true
      else {
        val (_, bi) = ranked.minBy { case (r, i) => (r, i) }
        toks = (toks.take(bi) :+ (toks(bi) + toks(bi + 1))) ++ toks.drop(bi + 2)
      }
    }
    toks
  }

  // small alphabet → dense merges exercise deep merge chains
  private def lowerWord(rnd: scala.util.Random): String =
    Array.fill(rnd.nextInt(13))(('a' + rnd.nextInt(5)).toChar).mkString

  test("default table is well-formed and validate rejects malformed tables") {
    Bpe.validate(Bpe.Default)
    // composite side that no earlier merge produced
    assertThrows[IllegalArgumentException] {
      Bpe.validate(IndexedSeq(("th", "e")))
    }
    // duplicate merge results
    assertThrows[IllegalArgumentException] {
      Bpe.validate(IndexedSeq(("a", "b"), ("a", "b")))
    }
  }

  test("all-at-once encode == one-at-a-time model on random words (default table)") {
    val rnd = new scala.util.Random(4242)
    (1 to 400).foreach { _ =>
      val w = lowerWord(rnd)
      assert(Bpe.encode(w, Bpe.Default).toSeq == oneAtATime(w, Bpe.Default))
    }
    // and real english-ish words against the learned table
    Seq("the", "theme", "stream", "window", "join", "thethe", "x").foreach { w =>
      assert(Bpe.encode(w, Bpe.Default).toSeq == oneAtATime(w, Bpe.Default))
    }
  }

  test("all-at-once == one-at-a-time on random TRAINED tables (the oracle equivalence)") {
    val rnd = new scala.util.Random(99)
    (1 to 30).foreach { _ =>
      val ws = List.fill(30)(lowerWord(rnd)).filter(_.nonEmpty)
      val table = Bpe.trainFromCounts(
        ws.groupBy(identity).map { case (w, g) => (w, g.size.toLong) }.toSeq,
        numMerges = 20, minFrequency = 2)
      Bpe.validate(table) // learned tables are always well-formed
      ws.foreach { w =>
        assert(Bpe.encode(w, table).toSeq == oneAtATime(w, table))
      }
    }
  }

  test("greedy merge order: lowest rank wins, scan skips merged tokens") {
    // table: (a,a) then (aa,a) — "aaa" must become [aa, a] then no (aa,a)?
    // no: (aa,a) applies to the RESULT → [aaa]; "aaaa" → [aa,aa] (scan
    // skip) and (aa,aa) is not in the table, so it stays two tokens.
    val t = IndexedSeq(("a", "a"), ("aa", "a"))
    assert(Bpe.encode("aaa", t).toSeq == Seq("aaa", "_"))
    assert(Bpe.encode("aaaa", t).toSeq == Seq("aa", "aa", "_"))
    assert(Bpe.encode("", t).toSeq == Seq("_"))
  }

  test("trainFromCounts is deterministic and learns the dominant pair first") {
    val counts = Seq(("the", 10L), ("then", 4L), ("at", 3L))
    val m = Bpe.trainFromCounts(counts, numMerges = 3)
    // (t,h) and (h,e) tie at 14 — the lexicographic tiebreak is what
    // makes training deterministic, and (h,e) sorts first
    assert(m.head == ("h", "e"))
    assert(m == Bpe.trainFromCounts(counts, numMerges = 3))
  }

  test("kernel bpeTokens == per-word encode over extracted lowercased words") {
    val text = "The Theme; slow-JOIN window99 café Éclair"
    val words = "[A-Za-z]+".r.findAllIn(text).map(_.toLowerCase).toSeq
    val expect = words.flatMap(w => Bpe.encode(w, Bpe.Default))
    val got = Bpe.bpeTokens(UTF8String.fromString(text))
      .toArray[UTF8String](org.apache.spark.sql.types.StringType).map(_.toString).toSeq
    assert(got == expect)
    assert(got.contains("the_")) // learned merge fires end-to-end
  }

  test("native.bpe_tokens works under codegen in a DataFrame plan") {
    import spark.implicits._
    val df = Seq("the fast stream", "window join", "").toDF("text")
      .select(native.bpe_tokens($"text").as("toks"))
    val rows = df.collect().map(_.getSeq[String](0).toSeq)
    assert(rows(0) == Seq("the_", "fast_", "stream_"))
    assert(rows(1) == Seq("window_", "join_"))
    assert(rows(2) == Seq.empty)
  }

  test("train rejects an oversized driver-collect vocab request loudly") {
    import spark.implicits._
    val docs = Seq("a b c").toDF("text")
    val e = intercept[IllegalArgumentException](
      Bpe.train(docs, "text", numMerges = 1,
        maxVocabWords = Bpe.MaxDriverVocabWords + 1))
    assert(e.getMessage.contains("driver-collect bound"), e.getMessage)
    intercept[IllegalArgumentException](
      Bpe.train(docs, "text", numMerges = 1, maxVocabWords = 0))
    // in-bounds requests still train
    val merges = Bpe.train(Seq("aa bb aa bb aa bb").toDF("text"), "text",
      numMerges = 1, maxVocabWords = 10, minFrequency = 1L)
    assert(merges.nonEmpty)
  }
}
