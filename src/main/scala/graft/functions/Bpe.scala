package graft.functions

import java.util.{LinkedHashMap => JLinkedHashMap, Map => JMap}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.unsafe.types.UTF8String

/** Byte-pair-encoding tokenizer with a learned merge table — true greedy
  * merge-table BPE (Sennrich et al. 2016), not the subword-lexer
  * approximation kept in `TextOps.text_tokens_bpe`.
  *
  * Token model: words are `[A-Za-z]+` runs of the raw text, ASCII-lowercased
  * (extract-then-lower, so Unicode case mapping can never introduce or
  * split a word — both Java and DuckDB agree bit-for-bit on ASCII).
  * A word starts as its characters plus a terminal `"_"` end-of-word symbol
  * (`_` cannot collide with `[a-z]`), then merges apply greedily:
  * repeatedly find the lowest-rank adjacent pair present and merge every
  * occurrence in one left-to-right scan (an occurrence consumed by a merge
  * cannot overlap the next).
  *
  * '''Well-formed tables and the one-merge-at-a-time equivalence.''' A
  * learned table is always ''well-formed'': any composite side of a merge
  * was itself produced by an earlier-ranked merge. For such tables the
  * all-at-once scan above is provably equivalent to merging ONE leftmost
  * best-rank occurrence per step: a merge of pair P=(L,R) creates token
  * M=L·R, every new adjacency involves M, and any table entry with M as a
  * side ranks strictly after the merge that created M — so while
  * occurrences of P remain, P stays the best pair, and M (≠ L, since R is
  * nonempty) can never form an overlapping new occurrence of P to the
  * left. The DuckDB oracle for `text_bpe_merges` exploits this: a
  * recursive CTE applies one merge per step and reaches the identical
  * token sequence ([[graft.BpeSpec]] pins the equivalence on random
  * inputs; [[validate]] enforces well-formedness at table load).
  *
  * '''Scale.''' Training is the standard two-phase shape every production
  * BPE trainer uses: ONE distributed word-histogram aggregation over the
  * corpus (the only wide operation — at 100 TB the distinct-word histogram
  * is a few million rows, collectable), then a driver-local merge loop
  * over the histogram. Encoding is a narrow per-row kernel (zero shuffle)
  * behind a codegen-friendly Catalyst expression ([[native.bpe_tokens]]),
  * with a per-thread LRU word cache — Zipf-distributed text re-encodes the
  * same words constantly, so the greedy loop runs only on cache misses.
  *
  * Reference scope: streamz has no tokenizer; this is a north-star
  * extension for token-budget accounting in training-data pipelines
  * (VERDICT r5 item #3).
  */
object Bpe {

  final val EndOfWord = "_"

  /** Merge table learned from the driver's `documents` corpus at sf0.1
    * by [[train]] with numMerges=200 (107 distinct-pair merges actually
    * materialize before the frequency floor) and minFrequency=2 — the
    * parameters recorded in [[BpeVocab]]; regenerate with
    * `graft.tools.TrainBpe` (same defaults). Rank = position. */
  lazy val Default: IndexedSeq[(String, String)] = DefaultMerges

  // filled by TrainBpe output; kept in a separate private val so the
  // public Default can validate once at first use
  private[graft] var DefaultMerges: IndexedSeq[(String, String)] =
    BpeVocab.merges

  /** Fail fast on a malformed table: every side of every merge must be a
    * base symbol (single `[a-z]` char or the end-of-word marker) or the
    * concatenation produced by an earlier-ranked merge. This is the
    * precondition for the one-merge-at-a-time equivalence (scaladoc above)
    * that the SQL oracle relies on. */
  def validate(merges: Seq[(String, String)]): Unit = {
    val produced = scala.collection.mutable.HashSet[String]()
    merges.zipWithIndex.foreach { case ((l, r), rank) =>
      def ok(s: String): Boolean =
        (s.length == 1 && (s.charAt(0) == '_' || (s.charAt(0) >= 'a' && s.charAt(0) <= 'z'))) ||
          produced.contains(s)
      require(ok(l) && ok(r),
        s"merge #$rank ($l, $r): side not a base symbol or earlier merge result")
      produced += (l + r)
    }
    require(merges.map { case (l, r) => l + r }.distinct.size == merges.size,
      "duplicate merge results in table")
  }

  private def ranksOf(merges: Seq[(String, String)]): JMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer](merges.size * 2)
    merges.zipWithIndex.foreach { case ((l, r), i) => m.put(l + " " + r, i) }
    m
  }

  private lazy val defaultRanks: JMap[String, Integer] = {
    validate(Default)
    ranksOf(Default)
  }

  /** One left-to-right merge pass of pair (l, r): every non-overlapping
    * occurrence merges; the scan pointer skips past a merged token. */
  private def mergeAll(toks: Array[String], pair: (String, String)): Array[String] = {
    val (l, r) = pair
    val out = new java.util.ArrayList[String](toks.length)
    var i = 0
    while (i < toks.length) {
      if (i < toks.length - 1 && toks(i) == l && toks(i + 1) == r) {
        out.add(l + r); i += 2
      } else { out.add(toks(i)); i += 1 }
    }
    out.toArray(new Array[String](out.size))
  }

  /** Greedy BPE of one lowercase word against an explicit merge list
    * (model-implementation entry point used by specs and custom vocabs;
    * the hot path goes through [[encodeCached]], which reuses the
    * prebuilt default rank map). */
  def encode(word: String, merges: IndexedSeq[(String, String)]): Array[String] =
    encodeWithRanks(word, ranksOf(merges), merges)

  private def encodeWithRanks(word: String, ranks: JMap[String, Integer],
                              merges: IndexedSeq[(String, String)]): Array[String] = {
    var toks: Array[String] = {
      val a = new Array[String](word.length + 1)
      var i = 0
      while (i < word.length) { a(i) = String.valueOf(word.charAt(i)); i += 1 }
      a(word.length) = EndOfWord
      a
    }
    var done = false
    while (!done && toks.length > 1) {
      var best = Int.MaxValue
      var j = 0
      while (j < toks.length - 1) {
        val r = ranks.get(toks(j) + " " + toks(j + 1))
        if (r != null && r.intValue() < best) best = r.intValue()
        j += 1
      }
      if (best == Int.MaxValue) done = true
      else toks = mergeAll(toks, merges(best))
    }
    toks
  }

  // ---------------------------------------------------------------- kernel

  /** Per-thread LRU word→tokens cache (Zipf text makes this ~free). */
  private val cache = new ThreadLocal[JLinkedHashMap[String, Array[String]]] {
    override def initialValue(): JLinkedHashMap[String, Array[String]] =
      new JLinkedHashMap[String, Array[String]](1024, 0.75f, true) {
        override def removeEldestEntry(e: JMap.Entry[String, Array[String]]): Boolean =
          size() > 8192
      }
  }

  private def encodeCached(word: String): Array[String] = {
    val c = cache.get()
    var toks = c.get(word)
    if (toks == null) {
      toks = encodeWithRanks(word, defaultRanks, Default)
      c.put(word, toks)
    }
    toks
  }

  /** Codegen kernel: all BPE tokens of a document in word order. Words
    * are `[A-Za-z]+` runs of the raw text, ASCII-lowercased — the exact
    * extraction the DuckDB oracle performs with `regexp_extract_all` +
    * `lower`, so token sequences match bit-for-bit. */
  def bpeTokens(text: UTF8String): ArrayData = {
    val s = text.toString
    val out = new java.util.ArrayList[UTF8String](s.length / 4 + 4)
    var i = 0
    val n = s.length
    while (i < n) {
      val c = s.charAt(i)
      if ((c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z')) {
        val start = i
        while (i < n && { val d = s.charAt(i)
          (d >= 'a' && d <= 'z') || (d >= 'A' && d <= 'Z') }) i += 1
        val word = {
          val sb = new java.lang.StringBuilder(i - start)
          var k = start
          while (k < i) {
            val d = s.charAt(k)
            sb.append(if (d >= 'A' && d <= 'Z') (d + 32).toChar else d)
            k += 1
          }
          sb.toString
        }
        val toks = encodeCached(word)
        var t = 0
        while (t < toks.length) { out.add(UTF8String.fromString(toks(t))); t += 1 }
      } else i += 1
    }
    new GenericArrayData(out.toArray(new Array[AnyRef](out.size)))
  }

  // -------------------------------------------------------------- training

  /** Driver-local BPE training over a word histogram (the classic
    * algorithm): repeatedly count adjacent-pair frequencies weighted by
    * word count, merge the most frequent pair (ties broken by the
    * lexicographically smallest (left, right) for determinism), stop at
    * `numMerges` or when no pair reaches `minFrequency`. */
  def trainFromCounts(wordCounts: Seq[(String, Long)], numMerges: Int,
                      minFrequency: Long = 2L): IndexedSeq[(String, String)] = {
    var words: Array[(Array[String], Long)] = wordCounts.iterator.map { case (w, c) =>
      val a = new Array[String](w.length + 1)
      var i = 0
      while (i < w.length) { a(i) = String.valueOf(w.charAt(i)); i += 1 }
      a(w.length) = EndOfWord
      (a, c)
    }.toArray
    val merges = IndexedSeq.newBuilder[(String, String)]
    var made = 0
    var exhausted = false
    while (made < numMerges && !exhausted) {
      val pairCounts = scala.collection.mutable.HashMap[(String, String), Long]()
      words.foreach { case (toks, c) =>
        var j = 0
        while (j < toks.length - 1) {
          val p = (toks(j), toks(j + 1))
          pairCounts.update(p, pairCounts.getOrElse(p, 0L) + c)
          j += 1
        }
      }
      if (pairCounts.isEmpty) exhausted = true
      else {
        val best = pairCounts.toSeq.minBy { case ((l, r), c) => (-c, l, r) }
        if (best._2 < minFrequency) exhausted = true
        else {
          merges += best._1
          words = words.map { case (toks, c) => (mergeAll(toks, best._1), c) }
          made += 1
        }
      }
    }
    merges.result()
  }

  /** Largest word histogram [[train]] will pull to the driver: 4M
    * entries ≈ a few hundred MB of (word, count) rows — far under
    * driver heap, far over any useful BPE vocabulary (published
    * tokenizers train from ≤1M). A request above it fails loudly up
    * front instead of OOMing the driver mid-collect. */
  val MaxDriverVocabWords = 4000000

  /** Distributed training entry point: ONE wide aggregation builds the
    * word histogram (top `maxVocabWords` by frequency — at 100 TB the tail
    * below the cut cannot influence top-merge counts materially), then the
    * driver-local loop above. The collect is bounded by construction
    * (`limit(maxVocabWords)`), and `maxVocabWords` itself is bounded by
    * [[MaxDriverVocabWords]] — the loud-guard pattern of the sketch
    * kernels, applied to the one deliberate driver hot spot. */
  def train(df: DataFrame, textCol: String, numMerges: Int,
            maxVocabWords: Int = 1000000, minFrequency: Long = 2L): IndexedSeq[(String, String)] = {
    require(maxVocabWords >= 1, s"maxVocabWords must be >= 1: $maxVocabWords")
    require(maxVocabWords <= MaxDriverVocabWords,
      s"maxVocabWords=$maxVocabWords exceeds the driver-collect bound " +
        s"$MaxDriverVocabWords — a histogram that size belongs in a " +
        "distributed trainer, not a driver loop; lower the request or " +
        "raise Bpe.MaxDriverVocabWords deliberately")
    val counts = df
      .select(explode(expr(
        s"transform(regexp_extract_all($textCol, '[A-Za-z]+', 0), w -> lower(w))")).as("word"))
      .groupBy("word").count()
      .orderBy(desc("count"), asc("word"))
      .limit(maxVocabWords)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)))
      .toSeq
    trainFromCounts(counts, numMerges, minFrequency)
  }
}
