package graft.functions

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, IntegerLiteral}

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

  /** (name, usage, builder) for every SQL-exposed kernel. */
  private[graft] val functions: Seq[(String, String, Seq[Expression] => Expression)] = Seq(
    ("bpe_tokens", "bpe_tokens(text) - merge-table BPE tokens (learned default vocab)",
      { case Seq(text) => BpeEncode(text) }),
    ("graft_tokens", "graft_tokens(text) - whitespace tokens, empties dropped",
      { case Seq(text) => Tokens(text) }),
    ("graft_shingles3", "graft_shingles3(text) - distinct 3-token shingles",
      { case Seq(text) => Shingles3(text) }),
    ("graft_simhash", "graft_simhash(tokens, bits) - SimHash of a token array",
      { case Seq(toks, IntegerLiteral(bits)) => SimHash(toks, bits) }),
    ("graft_minhash_sigs", "graft_minhash_sigs(shingles, k) - k MinHash signatures",
      { case Seq(sh, IntegerLiteral(k)) => MinHashSigs(sh, k) }),
    ("graft_lsh_bucket", "graft_lsh_bucket(vec, planes) - sign-projection LSH bucket",
      { case Seq(vec, IntegerLiteral(p)) => LshBucket(vec, p) }),
    ("graft_decimal_dot", "graft_decimal_dot(a, b) - exact-decimal dot product",
      { case Seq(a, b) => DecimalDot(a, b) }),
    ("graft_double_dot", "graft_double_dot(a, b) - IEEE-double dot product",
      { case Seq(a, b) => DoubleDot(a, b) }))

  /** Register every kernel on a live session's FunctionRegistry. */
  def register(spark: SparkSession): Unit =
    functions.foreach { case (name, usage, builder) =>
      spark.sessionState.functionRegistry.registerFunction(
        FunctionIdentifier(name), info(name, usage), builder)
    }

  private[graft] def injections
      : Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] =
    functions.map { case (name, usage, builder) =>
      (FunctionIdentifier(name), info(name, usage), builder)
    }
}

/** `spark.sql.extensions` entry point (see [[GraftFunctions]] scaladoc). */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftFunctions.injections.foreach(ext.injectFunction)
}
