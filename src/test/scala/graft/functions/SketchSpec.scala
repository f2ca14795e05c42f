package graft.functions

import java.security.MessageDigest

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Pins the codegen sketch kernels to an INDEPENDENT plain-Scala model
  * derived from the definitions in SketchOps's oracle SQL (md5 hex
  * strings + string ops — not the digest-byte arithmetic the kernels
  * use), plus the merge laws that make the sketches safe under any
  * partitioning. If a kernel and the model ever disagree, either the
  * DuckDB oracle or the kernel would drift — this is the tripwire.
  */
class SketchSpec extends SparkSuite {
  import spark.implicits._

  // ---- independent model: hex-string formulation, as in the oracle ----

  private def md5hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString

  /** HLL (bucket, rho) of a value per the oracle SQL: bucket = first
    * hex byte; rho from leading zero nibbles of the 12-char tail. */
  private def modelHll(v: String): (Int, Int) = {
    val h = md5hex(v)
    val bucket = Integer.parseInt(h.substring(0, 2), 16)
    val tail = h.substring(2, 14)
    val stripped = tail.dropWhile(_ == '0')
    val rho =
      if (stripped.isEmpty) 49
      else {
        val nzb = stripped.head match {
          case '1' => 3
          case '2' | '3' => 2
          case '4' | '5' | '6' | '7' => 1
          case _ => 0
        }
        (12 - stripped.length) * 4 + nzb + 1
      }
    (bucket, rho)
  }

  private def modelRegisters(values: Seq[String]): Array[Int] = {
    val regs = new Array[Int](Sketches.HllM)
    values.foreach { v =>
      val (b, r) = modelHll(v)
      if (r > regs(b)) regs(b) = r
    }
    regs
  }

  private def modelEstimate(regs: Array[Int]): Double =
    Sketches.HllNum / regs.map(Sketches.HllScale >>> _).sum.toDouble

  /** CMS cell per the oracle SQL: first 8 hex chars of md5("r|tok"). */
  private def modelCell(r: Int, tok: String): Int =
    (java.lang.Long.parseLong(md5hex(s"$r|$tok").substring(0, 8), 16)
      % Sketches.CmWidth).toInt

  /** Bloom positions per the oracle SQL: 4-hex-char chunks 1-4, 5-8. */
  private def modelPos(v: String): Seq[Int] = {
    val h = md5hex(v)
    Seq(0, 1).map(i =>
      (java.lang.Long.parseLong(h.substring(4 * i, 4 * i + 4), 16)
        % Sketches.BloomM).toInt)
  }

  private val words: Seq[String] =
    (1 to 3000).map(i => s"w${i % 700}-${i % 13}") ++ Seq("", "é", "a b", "0")

  // ---- HLL ----

  test("hll kernel registers equal the hex-formulation model") {
    val sk = words.toDF("v").repartition(7)
      .agg(native.hll_sketch($"v").as("sk"))
      .select($"sk", native.hll_estimate($"sk").as("est"),
        native.hll_nonzero($"sk").as("nz"))
      .head()
    val regs = modelRegisters(words)
    assert(sk.getAs[Array[Byte]]("sk").toSeq == regs.map(_.toByte).toSeq)
    // bit-exact: same integer sum, same shared constant, one division
    assert(sk.getAs[Double]("est") == modelEstimate(regs))
    assert(sk.getAs[Long]("nz") == regs.count(_ != 0).toLong)
  }

  test("hll estimate is within the p=8 error envelope on real keys") {
    val li = spark.read.parquet(s"${sf()}/lineitem.parquet")
      .select($"l_orderkey".cast("string").as("v"))
    val est = li.agg(native.hll_sketch($"v").as("sk"))
      .select(native.hll_estimate($"sk")).as[Double].head()
    val exact = li.distinct().count().toDouble
    // 1.04/sqrt(256) ≈ 6.5% standard error; allow 4 sigma
    assert(math.abs(est - exact) / exact < 0.26, s"est=$est exact=$exact")
  }

  test("hll sketches merge associatively across any split") {
    val (a, b) = words.splitAt(1234)
    val skA = a.toDF("v").agg(native.hll_sketch($"v").as("sk"))
    val skB = b.toDF("v").agg(native.hll_sketch($"v").as("sk"))
    val merged = skA.union(skB)
      .agg(native.hll_merge($"sk").as("sk"))
      .select(native.hll_estimate($"sk")).as[Double].head()
    val whole = words.toDF("v").agg(native.hll_sketch($"v").as("sk"))
      .select(native.hll_estimate($"sk")).as[Double].head()
    assert(merged == whole)
  }

  test("hll_merge rejects a non-sketch binary loudly") {
    val bad = Seq(Array[Byte](1, 2, 3)).toDF("sk")
    val e = intercept[Exception] {
      bad.agg(native.hll_merge($"sk")).collect()
    }
    val msgs = Iterator.iterate[Throwable](e)(_.getCause).takeWhile(_ != null)
      .flatMap(t => Option(t.getMessage)).mkString("\n")
    assert(msgs.contains("hll_merge"), s"unexpected error chain:\n$msgs")
  }

  // ---- CMS ----

  test("cms kernel point estimates equal the hex-formulation model") {
    val grid = new Array[Long](Sketches.CmDepth * Sketches.CmWidth)
    words.foreach { w =>
      (0 until Sketches.CmDepth).foreach(r =>
        grid(r * Sketches.CmWidth + modelCell(r, w)) += 1L)
    }
    def modelQuery(w: String): Long =
      (0 until Sketches.CmDepth)
        .map(r => grid(r * Sketches.CmWidth + modelCell(r, w))).min
    val probes = words.distinct.take(40) :+ "never-seen-token"
    val sk = words.toDF("v").repartition(5)
      .agg(native.cms_sketch($"v").as("sk"))
    val got = probes.toDF("p").crossJoin(broadcast(sk))
      .select($"p", native.cms_query($"sk", $"p").as("est"))
      .as[(String, Long)].collect().toMap
    val exact = words.groupBy(identity).view.mapValues(_.size.toLong).toMap
    probes.foreach { p =>
      assert(got(p) == modelQuery(p), s"probe $p")
      // one-sided error: estimate never under-counts
      assert(got(p) >= exact.getOrElse(p, 0L), s"probe $p under-counts")
    }
  }

  test("weighted cms over grouped counts is bit-identical to unit inserts over occurrences") {
    // counters are pure sums: inserting (value, count) once must produce
    // the SAME serialized grid as count unit inserts — the contract that
    // lets sketch_countmin_topk build its grid from the grouped relation
    val plain = words.toDF("v").repartition(5)
      .agg(native.cms_sketch($"v").as("sk"))
      .as[Array[Byte]].head()
    val weighted = words.toDF("v").repartition(5)
      .groupBy($"v").agg(count(lit(1)).as("c"))
      .agg(native.cms_sketch_weighted($"v", $"c").as("sk"))
      .as[Array[Byte]].head()
    assert(java.util.Arrays.equals(plain, weighted),
      "weighted grouped build diverged from the unit-insert grid")
  }

  // ---- Bloom ----

  test("bloom kernel bitset equals the hex-formulation model; no false negatives") {
    val members = words.distinct
    val sk = members.toDF("v").repartition(3)
      .agg(native.bloom_sketch($"v").as("sk"))
    val bits = sk.select($"sk").as[Array[Byte]].head()
    val model = new Array[Byte](Sketches.BloomM / 8)
    members.foreach(m => modelPos(m).foreach { p =>
      model(p >>> 3) = (model(p >>> 3) | (1 << (p & 7))).toByte
    })
    assert(bits.toSeq == model.toSeq)
    // no false negatives, and containment matches the model for strangers
    val strangers = (1 to 500).map(i => s"stranger-$i")
    val got = (members ++ strangers).toDF("p").crossJoin(broadcast(sk))
      .select($"p", native.bloom_contains($"sk", $"p").as("hit"))
      .as[(String, Boolean)].collect().toMap
    members.foreach(m => assert(got(m), s"false negative for $m"))
    strangers.foreach { s0 =>
      val expect = modelPos(s0).forall(p => (model(p >>> 3) & (1 << (p & 7))) != 0)
      assert(got(s0) == expect, s"stranger $s0")
    }
  }

  test("scalar sketch queries reject wrong-size binaries loudly") {
    def errOf(body: => Any): String = {
      val e = intercept[Exception](body)
      Iterator.iterate[Throwable](e)(_.getCause).takeWhile(_ != null)
        .flatMap(t => Option(t.getMessage)).mkString("\n")
    }
    val bad = Seq(Array[Byte](1, 2, 3)).toDF("sk")
    assert(errOf(bad.select(native.hll_estimate($"sk")).collect())
      .contains("hll_estimate"))
    assert(errOf(bad.select(native.hll_nonzero($"sk")).collect())
      .contains("hll_nonzero"))
    assert(errOf(bad.select(native.cms_query($"sk", lit("x"))).collect())
      .contains("cms_query"))
    assert(errOf(bad.select(native.bloom_contains($"sk", lit("x"))).collect())
      .contains("bloom_contains"))
  }

  // ---- log-histogram quantile buckets (sketch_quantile_hist) ----

  test("log-histogram bucket bounds bracket every value at <= 1/16 relative width") {
    // the query's bucket/bound arithmetic, re-derived independently:
    // bucket(v) must place v within [lo(bucket), hi(bucket)], and the
    // log region's width must stay under lo/16 — the sketch's accuracy
    // contract for any long, not just the prices the query happens to see
    def bucket(v: Long): Long = {
      val blen = 64 - java.lang.Long.numberOfLeadingZeros(v)
      if (v < 32) v else 32L + (blen - 6) * 16 + ((v >>> (blen - 5)) - 16)
    }
    def lo(b: Long): Long =
      if (b < 32) b else (16 + (b - 32) % 16) << ((b - 32) / 16 + 1)
    def hi(b: Long): Long =
      if (b < 32) b else ((16 + (b - 32) % 16 + 1) << ((b - 32) / 16 + 1)) - 1
    val rnd = new scala.util.Random(7)
    val samples = (0L until 32L) ++ Seq(32L, 33L, 63L, 64L, 1L << 40, Long.MaxValue / 2) ++
      (1 to 5000).map(_ => math.abs(rnd.nextLong()) / 2 + 1)
    samples.filter(_ >= 1).foreach { v =>
      val b = bucket(v)
      assert(lo(b) <= v && v <= hi(b), s"v=$v bucket=$b lo=${lo(b)} hi=${hi(b)}")
      if (v >= 32)
        assert(hi(b) - lo(b) + 1 <= lo(b) / 16.0 + 1, s"width too wide at v=$v")
      // buckets are monotone in v: the quantile walk's ordering premise
      assert(bucket(hi(b)) == b && (b < 32 || bucket(lo(b) - 1) == b - 1))
    }
  }

  test("histogram quantile bounds bracket the exact order statistic (the r8 control, moved out of the query)") {
    import spark.implicits._
    // the sketch_quantile_hist contract on real data: for each pct, the
    // bucket-walk bounds must bracket the GlobalOrder exact order
    // statistic. This control ran INSIDE the oracle query through r8;
    // it is a range-partitioned global sort, so at scale it would pace
    // the demonstration — the query is now pure-sketch and the exact
    // comparison lives here, at test-data size, where a control belongs.
    val s = spark
    val dir = sf("sf0.01")
    val est = graft.SparkEntry.queries("sketch_quantile_hist")(s, dir)
      .select($"pct", $"n", $"est_lo", $"est_hi")
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(est.map(_._1).toSeq == Seq(50L, 90L, 99L))
    val li = graft.Tables(s, dir, "lineitem")
      .select(round($"l_extendedprice" * 100).cast("long").as("v"),
        $"l_orderkey", $"l_linenumber")
    val n = est.head._2
    assert(li.count() == n, "sketch n must be the exact row count")
    val ranked = GlobalOrder.withRowNumber(li, "pos", $"v", $"l_orderkey", $"l_linenumber")
    val wanted = est.map { case (pct, nn, _, _) => (pct * nn + pct) / 100 }.toSet
    val exact = ranked.filter($"pos".isin(wanted.toSeq: _*))
      .select($"pos", $"v").as[(Long, Long)].collect().toMap
    est.foreach { case (pct, nn, lo, hi) =>
      val ev = exact((pct * nn + pct) / 100)
      assert(lo <= ev && ev <= hi, s"pct=$pct: exact=$ev outside [$lo, $hi]")
      // and the bounds honor the ≤1/16 relative width the sketch promises
      if (lo >= 32) assert(hi - lo + 1 <= lo / 16.0 + 1)
    }
  }

  test("sketch SQL surface is registered") {
    GraftFunctions.register(spark)
    words.toDF("v").createOrReplaceTempView("sketch_words")
    val est = spark.sql(
      """SELECT hll_estimate(hll_sketch(v)) AS e,
        |       hll_nonzero(hll_sketch(v)) AS n,
        |       cms_query(cms_sketch(v), 'w1-1') AS c,
        |       bloom_contains(bloom_sketch(v), 'w1-1') AS b
        |FROM sketch_words""".stripMargin).head()
    assert(est.getAs[Double]("e") > 0 && est.getAs[Long]("n") > 0)
    assert(est.getAs[Long]("c") >= 1L && est.getAs[Boolean]("b"))
  }
}
