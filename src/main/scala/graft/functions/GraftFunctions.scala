package graft.functions

import org.apache.spark.sql.{AnalysisException, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, IntegerLiteral, Literal}

/** SQL surface for the native kernels: every custom Catalyst expression in
  * this package becomes a SQL-callable function, so `spark.sql` users get
  * the same codegen'd kernels as the Column API —
  * `SELECT bpe_tokens(text) FROM docs`,
  * `SELECT graft_minhash_sigs(graft_shingles3(text), 8) ...`.
  *
  * Two registration paths share one builder table:
  *  - [[GraftExtensions]] — the `SparkSessionExtensions` injection point
  *    for production sessions (`spark.sql.extensions=graft.functions.GraftExtensions`),
  *    the idiomatic way to ship a function library with an application;
  *  - [[GraftFunctions.register]] — direct FunctionRegistry registration
  *    on an already-running session (tests, notebooks).
  *
  * Parameterized kernels take their parameter as a literal int argument,
  * exactly like Spark's own `round(x, 2)`.
  */
object GraftFunctions {

  private def info(name: String, usage: String) =
    new ExpressionInfo(getClass.getCanonicalName, null, name, usage, "")

  /** One SQL-exposed kernel: `build` matches only well-formed argument
    * lists; `litIntParam` names the literal-int parameter (if any) for
    * the NON_FOLDABLE_ARGUMENT error path. */
  private[graft] final case class Fn(name: String, usage: String, arity: Int,
      litIntParam: Option[String], build: PartialFunction[Seq[Expression], Expression])

  /** Every SQL-exposed kernel. */
  private[graft] val functions: Seq[Fn] = Seq(
    Fn("bpe_tokens", "bpe_tokens(text) - merge-table BPE tokens (learned default vocab)",
      1, None, { case Seq(text) => BpeEncode(text) }),
    Fn("graft_tokens", "graft_tokens(text) - whitespace tokens, empties dropped",
      1, None, { case Seq(text) => Tokens(text) }),
    Fn("graft_shingles3", "graft_shingles3(text) - distinct 3-token shingles",
      1, None, { case Seq(text) => Shingles3(text) }),
    Fn("graft_simhash", "graft_simhash(tokens, bits) - SimHash of a token array",
      2, Some("bits"), { case Seq(toks, IntegerLiteral(bits)) => SimHash(toks, bits) }),
    Fn("graft_minhash_sigs", "graft_minhash_sigs(shingles, k) - k MinHash signatures",
      2, Some("k"), { case Seq(sh, IntegerLiteral(k)) => MinHashSigs(sh, k) }),
    Fn("graft_lsh_bucket", "graft_lsh_bucket(vec, planes) - sign-projection LSH bucket",
      2, Some("planes"), { case Seq(vec, IntegerLiteral(p)) => LshBucket(vec, p) }),
    Fn("graft_decimal_dot", "graft_decimal_dot(a, b) - exact-decimal dot product",
      2, None, { case Seq(a, b) => DecimalDot(a, b) }),
    Fn("graft_double_dot", "graft_double_dot(a, b) - IEEE-double dot product",
      2, None, { case Seq(a, b) => DoubleDot(a, b) }),
    Fn("graft_nfc", "graft_nfc(text) - Unicode NFC normalization (zero-copy on ASCII)",
      1, None, { case Seq(text) => NfcNormalize(text) }),
    Fn("graft_rp_project", "graft_rp_project(vec, k) - exact-decimal JL projection onto k md5 hyperplanes",
      2, Some("k"), { case Seq(vec, IntegerLiteral(k)) => RpProject(vec, k) }),
    Fn("hll_sketch", "hll_sketch(x) - 256-register HLL distinct sketch (binary, mergeable)",
      1, None, { case Seq(x) => HllSketchAgg(x) }),
    Fn("hll_merge", "hll_merge(sketch) - register-wise max merge of HLL sketches",
      1, None, { case Seq(x) => HllMergeAgg(x) }),
    Fn("hll_estimate", "hll_estimate(sketch) - deterministic HLL cardinality estimate",
      1, None, { case Seq(x) => HllEstimate(x) }),
    Fn("hll_nonzero", "hll_nonzero(sketch) - populated-register count of an HLL sketch",
      1, None, { case Seq(x) => HllNonzero(x) }),
    Fn("cms_sketch", "cms_sketch(x) - 3x1024 Count-Min counter grid (binary, mergeable)",
      1, None, { case Seq(x) => CmsSketchAgg(x) }),
    Fn("cms_query", "cms_query(sketch, x) - Count-Min point-frequency estimate",
      2, None, { case Seq(sk, x) => CmsQuery(sk, x) }),
    Fn("bloom_sketch", "bloom_sketch(x) - 2 KiB Bloom bitset (binary, mergeable)",
      1, None, { case Seq(x) => BloomSketchAgg(x) }),
    Fn("bloom_contains", "bloom_contains(sketch, x) - Bloom membership, no false negatives",
      2, None, { case Seq(sk, x) => BloomContains(sk, x) }))

  /** Constant-int view of an expression at analysis time: a plain INT
    * literal, or any foldable integral expression (`CAST(64 AS BIGINT)`,
    * `32+32`, …) folded here — the builder runs BEFORE ConstantFolding,
    * so accepting only `IntegerLiteral` would reject arguments that are
    * constants in every sense the user cares about. */
  private def constInt(e: Expression): Option[Int] = e match {
    case IntegerLiteral(i) => Some(i)
    case _ if e.foldable =>
      try e.eval() match {
        case i: java.lang.Integer => Some(i)
        case l: java.lang.Long if l.longValue().isValidInt => Some(l.toInt)
        case s: java.lang.Short => Some(s.toInt)
        case b: java.lang.Byte => Some(b.toInt)
        case _ => None
      } catch { case _: Exception => None }
    case _ => None
  }

  /** Builders are called by the analyzer with whatever the user typed —
    * a bad call must surface as an AnalysisException carrying the usage
    * string (Spark's own error classes), never a raw MatchError. */
  private def builder(fn: Fn): Seq[Expression] => Expression = exprs => {
    if (exprs.length != fn.arity)
      throw new AnalysisException("WRONG_NUM_ARGS.WITHOUT_SUGGESTION", Map(
        "functionName" -> s"`${fn.name}` (usage: ${fn.usage})",
        "expectedNum" -> fn.arity.toString,
        "actualNum" -> exprs.length.toString,
        "docroot" -> "https://spark.apache.org/docs/latest"))
    val normalized = fn.litIntParam match {
      case None => exprs
      case Some(param) => constInt(exprs.last) match {
        case Some(i) => exprs.init :+ Literal(i)
        case None if exprs.last.foldable =>
          // constant, but not usable as an INT (wrong type / out of
          // range) — saying "non-foldable" here would be a lie
          throw new AnalysisException("INVALID_PARAMETER_VALUE.INTEGER", Map(
            "parameter" -> s"`$param`",
            "functionName" -> s"`${fn.name}` (usage: ${fn.usage})",
            "invalidValue" -> exprs.last.sql))
        case None => // genuinely non-constant
          throw new AnalysisException("NON_FOLDABLE_ARGUMENT", Map(
            "funcName" -> s"`${fn.name}` (usage: ${fn.usage})",
            "paramName" -> s"`$param`",
            "paramType" -> "\"INT\""))
      }
    }
    fn.build.applyOrElse(normalized, (_: Seq[Expression]) =>
      // defensive: arity and the literal parameter are both normalized
      // above, so the partial functions are total here
      throw new AnalysisException("INTERNAL_ERROR", Map(
        "message" -> s"graft function builder fell through for ${fn.name} (${fn.usage})")))
  }

  /** Register every kernel on a live session's FunctionRegistry. */
  def register(spark: SparkSession): Unit =
    functions.foreach { fn =>
      spark.sessionState.functionRegistry.registerFunction(
        FunctionIdentifier(fn.name), info(fn.name, fn.usage), builder(fn))
    }

  private[graft] def injections
      : Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] =
    functions.map { fn => (FunctionIdentifier(fn.name), info(fn.name, fn.usage), builder(fn)) }
}

/** `spark.sql.extensions` entry point (see [[GraftFunctions]] scaladoc).
  * Besides the kernel functions, injects the [[TableLogSql]] parser so
  * a pure-SQL session can run the TableLog maintenance statements
  * (`GRAFT DELETE FROM … WHERE …`, `GRAFT RESTORE … TO VERSION n`,
  * `GRAFT VACUUM …`) with semantics identical to the Scala calls. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftFunctions.injections.foreach(ext.injectFunction)
    ext.injectParser((_, delegate) => TableLogSql.parser(delegate))
  }
}
