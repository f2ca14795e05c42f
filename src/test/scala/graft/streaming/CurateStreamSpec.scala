package graft.streaming

import graft.SparkSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** The streaming curation stage must hand down the SAME verdicts and
  * bytes the batch stage produces on the same corpus — a pipeline that
  * quality-filters live ingest and backfills history may not disagree
  * with itself. Both transforms are stateless, so the contract is
  * per-row equality, checked across multi-batch arrival.
  */
class CurateStreamSpec extends SparkSuite {
  import spark.implicits._
  implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  // the quality_repetition query thresholds (queries/CurationOps.scala)
  private val MaxTop2 = 0.06
  private val MaxDup2 = 0.05
  private val MaxDupW = 0.65

  private def realDocs = spark.read.parquet(sf() + "/documents.parquet")
    .select($"doc_id", $"text").as[(Long, String)].collect().sortBy(_._1)

  test("qualityRepetition: per-row kernel == batch explode+agg, bit-exact, across batches") {
    val docs = realDocs
    assert(docs.length > 100, s"fixture corpus too small: ${docs.length}")
    val (b1, b2) = docs.splitAt(docs.length / 2)

    val in = MemoryStream[(Long, String)]
    val q = Curate.qualityRepetition(
        in.toDS().toDF("doc_id", "text"), "doc_id", "text",
        MaxTop2, MaxDup2, MaxDupW)
      .writeStream.format("memory").queryName("curate_q").outputMode("append").start()
    try {
      in.addData(b1: _*); q.processAllAvailable()
      in.addData(b2: _*); q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("curate_q")
      .as[(Long, Long, Double, Double, Double, Boolean)].collect().toSet

    // batch oracle: the distributed explode + two keyed aggregations path
    // the oracle-checked query runs, plus the same threshold verdict.
    // Exact ==: the kernel must reproduce the doubles bit-for-bit.
    val batch = graft.functions.Curation.repetitionMetrics(
        docs.toSeq.toDF("doc_id", "text")
          .withColumn("toks", graft.functions.native.tokens($"text")),
        "doc_id", "toks")
      .withColumn("keep",
        $"top_2gram_frac" <= MaxTop2 && $"dup_2gram_frac" <= MaxDup2 &&
          $"dup_word_frac" <= MaxDupW)
      .as[(Long, Long, Double, Double, Double, Boolean)].collect().toSet
    assert(got.size == batch.size, s"row counts differ: ${got.size} vs ${batch.size}")
    assert(got == batch)
    // the corpus-tuned thresholds actually discriminate on this fixture
    assert(got.exists(_._6) && got.exists(!_._6), "verdict must split the corpus")
  }

  test("qualityRepetition edge rows: short docs dropped, 2-token doc kept") {
    val edge = Seq((1L, ""), (2L, "word"), (3L, "a a"), (4L, "x y"))
    val out = Curate.qualityRepetition(edge.toDF("doc_id", "text"),
        "doc_id", "text", MaxTop2, MaxDup2, MaxDupW)
      .as[(Long, Long, Double, Double, Double, Boolean)].collect()
      .sortBy(_._1)
    assert(out.map(_._1).toSeq == Seq(3L, 4L), s"got ${out.toSeq}")
    // "a a": 1 distinct word of 2 → dup_word 0.5; one gram "a a" seen
    // once → dup_2gram 0.0, top_2gram 1.0 (fails the top-2-gram cap)
    assert(out(0) == ((3L, 2L, 0.5, 0.0, 1.0, false)))
    assert(out(1) == ((4L, 2L, 0.0, 0.0, 1.0, false)))
  }

  test("canonicalizeUrl: each rule on adversarial edges") {
    val cases = Seq(
      // all rules at once: fragment, case, default port, dot segment,
      // utm_ strip, param sort
      ("https://Host.COM:443/x/y/../z?utm_a=1&B=2#f", "https://host.com/x/z?B=2"),
      // fragment only; path case preserved
      ("HTTP://EX.com/P#frag", "http://ex.com/P"),
      // malformed (no scheme://authority): passes through minus fragment
      ("plain text #note", "plain text "),
      // nested dot segments resolve ONE level per pass (documented)
      ("http://h/a/../b/../c", "http://h/b/../c"),
      // params sort; non-default port kept; no query survives -> no '?'
      ("http://h:8080/p?utm_only=1", "http://h:8080/p"),
      // only the scheme's OWN default port strips: https on :80 and
      // http on :443 are real non-default ports, distinct resources
      ("https://h:80/x", "https://h:80/x"),
      ("http://h:443/x", "http://h:443/x"),
      // trailing newline: '\z' (end of TEXT in Java AND RE2) means the
      // port does NOT strip — Java's '$' alone would strip it here while
      // the RE2 oracle would not, silently forking the dedup key
      ("http://h:80\n", "http://h:80\n"),
      ("http://h/p?z=1&y=2&x=3", "http://h/p?x=3&y=2&z=1"))
    val got = cases.map(_._1).toDF("url")
      .select(graft.functions.Curation.canonicalizeUrl($"url").as("c"))
      .as[String].collect().toSeq
    cases.zip(got).foreach { case ((in, want), is) =>
      assert(is == want, s"canonicalizeUrl($in) = $is, wanted $want")
    }
  }

  test("normalize: streaming bytes == batch, across batches, with real Unicode") {
    // corpus rows plus adversarial rows the ASCII corpus can't produce:
    // decomposed accent (must compose), controls, CRLF runs, tabs
    val docs = realDocs.take(60) ++ Seq(
      (100001L, "cafe\u0301  au \u0007lait\r\n\r\n end\t"),
      (100002L, "\u0000\u001f only  controls \u007f"),
      (100003L, ""),
      (100004L, "   "))
    val (b1, b2) = docs.splitAt(30)

    val in = MemoryStream[(Long, String)]
    val q = Curate.normalize(in.toDS().toDF("doc_id", "text"), "text")
      .select($"doc_id", $"text_norm")
      .writeStream.format("memory").queryName("norm_q").outputMode("append").start()
    try {
      in.addData(b1: _*); q.processAllAvailable()
      in.addData(b2: _*); q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("norm_q").as[(Long, String)].collect().toMap

    val batch = Curate.normalize(docs.toSeq.toDF("doc_id", "text"), "text")
      .select($"doc_id", $"text_norm").as[(Long, String)].collect().toMap
    assert(got == batch)
    assert(got(100001L) == "caf\u00e9 au lait end")
    assert(got(100002L) == "only controls")
    assert(got(100003L) == "" && got(100004L) == "")
  }

  test("chunk: streaming windows == batch chunk_documents, incl. tail windows") {
    val docs = realDocs.take(60) ++ Seq(
      (100001L, "one two three"), // single partial window
      (100002L, ""), (100003L, "   ")) // tokenless rows drop
    val (b1, b2) = docs.splitAt(30)

    val in = MemoryStream[(Long, String)]
    val q = Curate.chunk(in.toDS().toDF("doc_id", "text"), "text", 64, 48)
      .select($"doc_id", $"chunk_idx", $"chunk_text", $"n_toks")
      .writeStream.format("memory").queryName("chunk_q").outputMode("append").start()
    try {
      in.addData(b1: _*); q.processAllAvailable()
      in.addData(b2: _*); q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("chunk_q")
      .as[(Long, Long, String, Long)].collect().toSet

    val batch = graft.functions.Curation
      .chunkDocuments(docs.toSeq.toDF("doc_id", "text"), "text", 64, 48)
      .select($"doc_id", $"chunk_idx", $"chunk_text", $"n_toks")
      .as[(Long, Long, String, Long)].collect().toSet
    assert(got == batch)
    assert(got.contains((100001L, 0L, "one two three", 3L)), "partial window missing")
    assert(!got.exists(r => r._1 == 100002L || r._1 == 100003L), "tokenless rows must drop")
    // overlap: a doc longer than the stride has its boundary tokens in
    // two windows
    val multi = got.groupBy(_._1).filter(_._2.size > 1)
    assert(multi.nonEmpty, "fixture has no multi-window doc")
    val (_, ws) = multi.head
    val sorted = ws.toSeq.sortBy(_._2)
    val w0 = sorted(0)._3.split(' '); val w1 = sorted(1)._3.split(' ')
    assert(w0.drop(48).sameElements(w1.take(w0.length - 48)),
      "window overlap must repeat the boundary tokens")
  }

  test("qualityHeuristics: streaming verdicts == batch on the armed corpus") {
    // same arming the oracle-checked query uses: inject the C4 flags on
    // deterministic id slices so both flags actually fire
    val docs = realDocs.take(120).map { case (id, text) =>
      val armed = text +
        (if (id % 7 == 0) " {code}" else "") +
        (if (id % 11 == 0) " lorem ipsum dolor" else "")
      (id, armed)
    } ++ Seq((200001L, "tiny"), (200002L, ""))
    val (b1, b2) = docs.splitAt(60)
    val stops = Seq("the", "a", "and", "of", "to", "in")

    val in = MemoryStream[(Long, String)]
    val q = Curate.qualityHeuristics(in.toDS().toDF("doc_id", "text"),
        "text", 5L, 3.0, 10.0, 2L, stops)
      .select($"doc_id", $"n_words", $"mean_word_len", $"n_stop_hits",
        $"has_brace", $"has_lorem", $"keep")
      .writeStream.format("memory").queryName("heur_q").outputMode("append").start()
    try {
      in.addData(b1: _*); q.processAllAvailable()
      in.addData(b2: _*); q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("heur_q").collect().map(r => r.getLong(0) -> r).toMap

    val batch = Curate.qualityHeuristics(docs.toSeq.toDF("doc_id", "text"),
        "text", 5L, 3.0, 10.0, 2L, stops)
      .select($"doc_id", $"n_words", $"mean_word_len", $"n_stop_hits",
        $"has_brace", $"has_lorem", $"keep")
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(got.size == batch.size)
    got.foreach { case (id, r) => assert(r == batch(id), s"doc $id") }
    // flags and verdicts genuinely vary on the armed fixture
    val rows = got.values.toSeq
    assert(rows.exists(_.getBoolean(4)) && rows.exists(!_.getBoolean(4)))
    assert(rows.exists(_.getBoolean(5)) && rows.exists(!_.getBoolean(5)))
    assert(rows.exists(_.getBoolean(6)) && rows.exists(!_.getBoolean(6)))
    // the short doc fails the word-count gate; the empty doc has a null
    // mean but still a FALSE (not null) verdict
    assert(!got(200001L).getBoolean(6))
    assert(got(200002L).isNullAt(2) && !got(200002L).getBoolean(6))

    // minWords = 0: the word-count conjunct no longer short-circuits the
    // NULL mean — the verdict must STILL be false, never NULL
    val zeroMin = Curate.qualityHeuristics(
        Seq((1L, ""), (2L, "   ")).toDF("doc_id", "text"),
        "text", 0L, 3.0, 10.0, 0L, stops)
      .select($"doc_id", $"keep").collect()
    zeroMin.foreach { r =>
      assert(!r.isNullAt(1) && !r.getBoolean(1), s"empty doc keep: $r")
    }
  }

  test("htmlExtract: adversarial edges, streaming == batch") {
    val cases = Seq(
      // entity double-decode trap: author wrote the literal text '&lt;'
      (1L, "a &amp;lt; b", "a &lt; b"),
      // script body containing '<' and quotes is dropped wholesale
      (2L, "<p>x</p><script>if (1<2) alert(\"y\")</script><p>z</p>", "x z"),
      // multi-line comment swallowed by (?s)
      (3L, "a<!-- line1\nline2 -->b", "a b"),
      // unclosed tag survives as text (no '>' to terminate it)
      (4L, "text <unclosed and more", "text <unclosed and more"),
      // HTML tag names are case-insensitive: <SCRIPT>/<Style> drop too
      (7L, "a<SCRIPT>var x</SCRIPT>b<Style>.c{}</Style>c", "a b c"),
      // all six entities
      (5L, "&lt;&gt;&quot;&#39;&nbsp;&amp;", "<>\"' &"),
      (6L, "", ""))
    val got = cases.map(t => (t._1, t._2)).toDF("doc_id", "html")
      .select($"doc_id", graft.functions.Curation.htmlExtract($"html").as("m"))
      .as[(Long, String)].collect().toMap
    cases.foreach { case (id, in, want) =>
      assert(got(id) == want, s"htmlExtract($in) = ${got(id)}, wanted $want")
    }

    val in = MemoryStream[(Long, String)]
    val q = Curate.htmlExtract(in.toDS().toDF("doc_id", "html"), "html")
      .select($"doc_id", $"html_main")
      .writeStream.format("memory").queryName("html_q").outputMode("append").start()
    try { in.addData(cases.map(t => (t._1, t._2)): _*); q.processAllAvailable() }
    finally q.stop()
    val streamed = spark.table("html_q").as[(Long, String)].collect().toMap
    assert(streamed == got)
  }

  test("piiRedact: streaming bytes and counts == batch, adversarial texts") {
    val texts = Seq(
      (1L, "mail a.b+c@x-y.co or 10.0.0.1 acct 12345678 done"),
      (2L, "no pii here at all"),
      (3L, "ip 999.1.1.1 still matches the dialect-intersection pattern"),
      (4L, "double dot a@b..com and short num 123456"),
      (5L, "u1@a.io u2@b.io 1.2.3.4 5.6.7.8 99999999 88888888"))
    val (b1, b2) = texts.splitAt(3)

    val in = MemoryStream[(Long, String)]
    val q = Curate.piiRedact(in.toDS().toDF("doc_id", "text"), "text")
      .select($"doc_id", $"redacted", $"n_email", $"n_ip", $"n_longnum")
      .writeStream.format("memory").queryName("pii_q").outputMode("append").start()
    try {
      in.addData(b1: _*); q.processAllAvailable()
      in.addData(b2: _*); q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("pii_q")
      .as[(Long, String, Long, Long, Long)].collect().toSet

    val batch = Curate.piiRedact(texts.toDF("doc_id", "text"), "text")
      .select($"doc_id", $"redacted", $"n_email", $"n_ip", $"n_longnum")
      .as[(Long, String, Long, Long, Long)].collect().toSet
    assert(got == batch)
    // spot-check the chain-positional semantics on the loaded row
    val r5 = got.find(_._1 == 5L).get
    assert(r5._2 == "<EMAIL> <EMAIL> <IP> <IP> <NUM> <NUM>", r5._2)
    assert((r5._3, r5._4, r5._5) == ((2L, 2L, 2L)))
    // and that redacted text is consistent with what Curation.piiRedact
    // (the single-column form the pipeline example uses) produces
    val viaColumn = texts.toDF("doc_id", "text")
      .select($"doc_id", graft.functions.Curation.piiRedact($"text").as("r"))
      .as[(Long, String)].collect().toMap
    got.foreach { case (id, red, _, _, _) => assert(viaColumn(id) == red) }
  }
}
