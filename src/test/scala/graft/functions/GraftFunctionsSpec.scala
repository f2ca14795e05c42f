package graft.functions

import graft.SparkSuite

/** SQL-callable native kernels: registered functions must produce the
  * same results as the Column API (same expressions underneath), and the
  * extension injection list must mirror the registry list.
  */
class GraftFunctionsSpec extends SparkSuite {
  import spark.implicits._

  test("registered SQL functions match the Column API results") {
    GraftFunctions.register(spark)
    Seq(("the fast stream", 1L), ("window join", 2L))
      .toDF("text", "id").createOrReplaceTempView("gf_docs")

    val sql = spark.sql(
      """SELECT id, bpe_tokens(text) AS bpe, graft_tokens(text) AS toks,
        |  graft_simhash(graft_tokens(text), 16) AS sh
        |FROM gf_docs""".stripMargin)
      .as[(Long, Seq[String], Seq[String], Long)].collect().sortBy(_._1)
    val api = spark.table("gf_docs")
      .select($"id", native.bpe_tokens($"text").as("bpe"),
        native.tokens($"text").as("toks"),
        native.simhash(native.tokens($"text"), 16).as("sh"))
      .as[(Long, Seq[String], Seq[String], Long)].collect().sortBy(_._1)
    assert(sql.toSeq == api.toSeq)
    assert(sql.head._2 == Seq("the_", "fast_", "stream_"))

    // parameterized kernels + dot products via SQL
    val dot = spark.sql(
      """SELECT graft_decimal_dot(array(CAST(1.5 AS FLOAT), CAST(2.0 AS FLOAT)),
        |                         array(CAST(2.0 AS FLOAT), CAST(0.5 AS FLOAT)))""".stripMargin)
      .head().getDouble(0)
    assert(dot == 4.0)
    val sigs = spark.sql(
      "SELECT graft_minhash_sigs(graft_shingles3('a b c d'), 4)")
      .head().getSeq[String](0)
    assert(sigs.length == 4 && sigs.forall(_ != null))

    // r8 kernels: NFC (decomposed 'e'+U+0301 composes) and JL projection
    // (signs must reproduce the LSH bucket bits — one arithmetic path)
    val nfc = spark.sql("SELECT graft_nfc('cafe\\u0301')")
      .head().getString(0)
    assert(nfc == "caf\u00e9")
    val pb = spark.sql(
      """SELECT graft_rp_project(array(CAST(0.5 AS FLOAT), CAST(-1.25 AS FLOAT)), 8),
        |  graft_lsh_bucket(array(CAST(0.5 AS FLOAT), CAST(-1.25 AS FLOAT)), 8)""".stripMargin)
      .head()
    val proj = pb.getSeq[Double](0)
    val bucket = pb.getLong(1)
    assert(proj.length == 8)
    proj.zipWithIndex.foreach { case (v, h) =>
      assert((v >= 0.0) == ((bucket >> h & 1L) == 1L))
    }
  }

  test("extension injection list mirrors the registry list") {
    assert(GraftFunctions.injections.map(_._1.funcName) ==
      GraftFunctions.functions.map(_.name))
    assert(GraftFunctions.functions.size >= 8)
  }

  test("bad calls raise AnalysisException with the usage string, not MatchError") {
    GraftFunctions.register(spark)
    // wrong arity
    val wrongArity = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT graft_simhash(array('a'))").collect()
    }
    assert(wrongArity.getMessage.contains("graft_simhash(tokens, bits)"))
    assert(wrongArity.getMessage.contains("2 parameters"))
    // any CONSTANT integral expression is accepted — folded at analysis
    // time like Spark's own literal-int parameters (a foldable-but-not-
    // IntegerLiteral arg used to be rejected with a misleading error)
    assert(spark.sql(
      "SELECT size(graft_minhash_sigs(array('a'), CAST(4 AS BIGINT)))")
      .head().getInt(0) == 4)
    assert(spark.sql(
      "SELECT size(graft_minhash_sigs(array('a'), length('abcd')))")
      .head().getInt(0) == 4)
    // a genuinely non-constant parameter still raises with the usage string
    val nonConstant = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT graft_minhash_sigs(array('a'), CAST(id AS INT)) " +
        "FROM range(3)").collect()
    }
    assert(nonConstant.getMessage.contains("graft_minhash_sigs(shingles, k)"))
    assert(nonConstant.getMessage.contains("foldable"))
    // a CONSTANT that cannot be an INT (out of range) gets the truthful
    // invalid-parameter error, not "non-foldable"
    val outOfRange = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT graft_minhash_sigs(array('a'), CAST(5000000000 AS BIGINT))")
        .collect()
    }
    assert(outOfRange.getMessage.contains("graft_minhash_sigs(shingles, k)"))
    assert(outOfRange.getMessage.contains("integer literal"))
    assert(!outOfRange.getMessage.contains("foldable"))
  }
}
