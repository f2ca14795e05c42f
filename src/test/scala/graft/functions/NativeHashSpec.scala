package graft.functions

import graft.SparkSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** The native expressions must agree exactly with the equivalent built-in
  * (declarative) constructions they replace — same md5, same decimal
  * rounding, same orderings — since those constructions mirror the DuckDB
  * oracle SQL.
  */
class NativeHashSpec extends SparkSuite {
  import spark.implicits._

  private val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "the quick brown fox jumps over the lazy cat"),
    (3L, "completely unrelated text with many different tokens here"),
    (4L, "a b"), // fewer than 3 tokens → no shingles
    (5L, "x  y   z  x y z x y") // repeated shingles, multiple spaces
  ).toDF("doc_id", "text")

  test("rp_project signs reproduce lsh_bucket bits (same planes, same exact sums)") {
    // the projection and the bucketer must agree plane for plane: bit h
    // of the 8-plane bucket is exactly sign(p_h) >= 0 of the UNROUNDED
    // projection — one exact-arithmetic path, two consumers
    val vecs = Seq(
      Tuple1(Array(0.25f, -1.5f, 3.125f, 0.0f)),
      Tuple1(Array.fill(64)(0.123456f)),
      Tuple1(Array.tabulate(64)(i => if (i % 3 == 0) -0.5f else 0.25f)),
      Tuple1(Array.fill(16)(0.0f))
    ).toDF("v")
    val rows = vecs.select(
        native.rp_project($"v", 8).as("p"),
        native.lsh_bucket($"v", 8).as("b"))
      .collect()
    rows.foreach { r =>
      val p = r.getSeq[Double](0)
      val b = r.getLong(1)
      p.zipWithIndex.foreach { case (v, h) =>
        assert((v >= 0.0) == ((b >> h & 1L) == 1L),
          s"plane $h: projection $v vs bucket bit ${(b >> h) & 1L}")
      }
    }
  }

  test("decimal_dot matches the decimal zip_with/aggregate construction") {
    val dec = DecimalType(38, 20)
    val vecs = Seq(
      (1L, Array(0.25f, -1.5f, 3.125f), Array(2.0f, 0.5f, -0.125f)),
      (2L, Array(1e-8f, 2e5f, -3.25f), Array(4.75f, -2e-6f, 0.875f)),
      (3L, Array.fill(64)(0.123456f), Array.fill(64)(-0.654321f))
    ).toDF("id", "a", "b")
    val got = vecs.select($"id", native.decimal_dot($"a", $"b").as("dot"))
    val want = vecs.select($"id",
      aggregate(
        zip_with($"a", $"b", (x, y) => (x.cast("double") * y.cast("double")).cast(dec)),
        lit(0).cast(dec), (acc, y) => (acc + y).cast(dec))
        .cast("double").as("dot"))
    val g = got.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val w = want.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // the built-in decimal chain loses scale on intermediate adds only when
    // magnitudes exceed 1e18 — not here, so equality is exact
    assert(g == w)
  }

  test("simhash(16) matches the md5-hex-digit-bit construction") {
    val toks = docs.select($"doc_id", filter(split($"text", " "), t => t =!= "").as("toks"))
      .filter(size($"toks") >= 1)
    val got = toks.select($"doc_id", native.simhash($"toks", 16).as("sh")).as[(Long, Long)]
      .collect().toMap
    // declarative reference: explode tokens ×16 bit positions
    val want = toks
      .select($"doc_id", explode($"toks").as("token"))
      .withColumn("hh", md5($"token"))
      .withColumn("j", explode(sequence(lit(1), lit(16))))
      .withColumn("nib", conv(expr("substring(hh, CAST((j + 3) / 4 AS INT), 1)"), 16, 10).cast("long"))
      .withColumn("bit", expr("(nib >> (3 - (j - 1) % 4)) % 2"))
      .groupBy($"doc_id", $"j").agg(sum($"bit" * 2 - 1).as("bal"))
      .groupBy($"doc_id")
      .agg(sum(when($"bal" >= 0, expr("shiftleft(1L, CAST(j - 1 AS INT))")).otherwise(0L)).as("sh"))
      .as[(Long, Long)].collect().toMap
    assert(got == want)
  }

  test("simhash: near-duplicate docs land close in hamming distance") {
    val toks = docs.select($"doc_id", filter(split($"text", " "), t => t =!= "").as("toks"))
    val sh = toks.select($"doc_id", native.simhash($"toks", 64).as("sh")).as[(Long, Long)]
      .collect().toMap
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(sh(1L), sh(2L)) < ham(sh(1L), sh(3L)))
  }

  test("native tokens/shingles3 match the declarative split/transform construction") {
    val declToks = filter(split($"text", " "), t => t =!= "")
    def declShingles(toks: org.apache.spark.sql.Column) =
      when(size(toks) >= 3,
        array_distinct(transform(sequence(lit(1), size(toks) - 2), i =>
          concat_ws(" ",
            element_at(toks, i), element_at(toks, i + 1), element_at(toks, i + 2)))))
        .otherwise(array().cast("array<string>"))
    val got = docs.select($"doc_id",
      TextFunctions.tokens($"text").as("toks"),
      TextFunctions.shingles3($"text").as("sharr"))
      .as[(Long, Seq[String], Seq[String])].collect().sortBy(_._1)
    val want = docs.select($"doc_id",
      declToks.as("toks"), declShingles(declToks).as("sharr"))
      .as[(Long, Seq[String], Seq[String])].collect().sortBy(_._1)
    assert(got.toSeq == want.toSeq)
  }

  test("minhash_sigs matches the explode/groupBy md5 construction") {
    val sharr = docs
      .select($"doc_id", TextFunctions.shingles3($"text").as("sharr"))
      .filter(size($"sharr") >= 1)
    val got = sharr.select($"doc_id", native.minhash_sigs($"sharr", 8).as("sigs"))
      .as[(Long, Seq[String])].collect().toMap
    val want = sharr
      .select($"doc_id", explode($"sharr").as("shingle"))
      .withColumn("h", explode(sequence(lit(1), lit(8))))
      .groupBy($"doc_id", $"h")
      .agg(min(md5(concat($"h".cast("string"), lit("|"), $"shingle"))).as("sig"))
      .groupBy($"doc_id")
      .agg(map_from_arrays(collect_list($"h"), collect_list($"sig")).as("m"))
      .as[(Long, Map[Int, String])].collect().toMap
      .map { case (id, m) => id -> (1 to 8).map(m) }
    assert(got.view.mapValues(_.toSeq).toMap == want.map { case (k, v) => k -> v.toSeq })
  }

  test("lsh_bucket matches the declarative md5-hyperplane construction") {
    val dec = DecimalType(38, 20)
    val rnd = new java.util.Random(7)
    val vecs = (1L to 20L).map(id => (id, Array.fill(16)(rnd.nextFloat() * 2 - 1)))
      .toDF("vec_id", "embedding")
    val got = vecs.select($"vec_id", native.lsh_bucket($"embedding", 8).as("bucket"))
      .as[(Long, Long)].collect().toMap
    // declarative mirror of the oracle SQL: md5-derived planes, exact sums
    val comps = vecs.select($"vec_id", posexplode($"embedding").as(Seq("i0", "xf")))
      .select($"vec_id", ($"i0" + 1).as("i"), $"xf".cast("double").as("x"))
    val planes = spark.range(1, 9).toDF("h")
      .crossJoin(spark.range(1, 17).toDF("i"))
      .select($"h", $"i",
        (((conv(substring(md5(concat($"h".cast("string"), lit("|"), $"i".cast("string"))), 1, 6), 16, 10)
          .cast("long") % 1000) - 500) / 1000.0).as("rv"))
    val want = comps.join(planes, "i")
      .groupBy($"vec_id", $"h")
      .agg(sum(($"x" * $"rv").cast(dec)).as("d"))
      .groupBy($"vec_id")
      .agg(sum(when($"d" >= 0, expr("shiftleft(1L, CAST(h - 1 AS INT))")).otherwise(0L))
        .as("bucket"))
      .as[(Long, Long)].collect().toMap
    assert(got == want)
  }

  test("subwordCount splits at letter/digit and punctuation boundaries") {
    val got = Seq(
      ("ab12cd ef-gh", 0), ("hello world", 0), ("x3", 0), ("", 0))
      .toDF("text", "pad")
      .select($"text", TextFunctions.subwordCount($"text").as("n"))
      .as[(String, Int)].collect().toMap
    assert(got("hello world") == 2) // plain whitespace tokens
    assert(got("x3") == 2)          // letter|digit boundary
    assert(got("ab12cd ef-gh") == 5) // ab|12|cd + ef|-gh
    assert(got("") == 0)
  }

  test("native expressions run inside Structured Streaming (streaming simhash dedup)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[(Long, String)]
    val q = in.toDF().toDF("doc_id", "text")
      .select($"doc_id", native.simhash(native.tokens($"text"), 16).as("sh"))
      .dropDuplicates("sh")
      .writeStream.format("memory").queryName("stream_simhash")
      .outputMode("append").start()
    in.addData((1L, "the quick brown fox"), (2L, "the quick brown fox"))
    q.processAllAvailable()
    in.addData((3L, "the quick brown fox"), (4L, "something else entirely here"))
    q.processAllAvailable(); q.stop()
    val got = spark.table("stream_simhash").as[(Long, Long)].collect().map(_._1).sorted
    // identical texts share a simhash → deduped across batches
    assert(got.toSeq == Seq(1L, 4L))
  }

  test("doc 4 (< 3 tokens) has no shingles") {
    val sharr = docs
      .select($"doc_id", TextFunctions.shingles3($"text").as("sharr"))
      .filter($"doc_id" === 4L)
      .select(size($"sharr")).as[Int].head()
    assert(sharr == 0)
  }
}
