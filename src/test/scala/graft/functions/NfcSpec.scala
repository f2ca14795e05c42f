package graft.functions

import graft.SparkSuite
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

/** Real-Unicode fixture for the NFC kernel (the TextLangFixtureSpec
  * honesty pattern: the synthetic corpus is pure ASCII, where NFC is the
  * identity -- these cases pin the behavior the corpus cannot reach).
  * All non-ASCII code points are spelled as escapes so composed vs
  * decomposed is visible in the source, not left to editor normalization.
  */
class NfcSpec extends SparkSuite {
  import spark.implicits._

  private def nfcOf(s: String): String =
    ExprKernels.nfc(UTF8String.fromString(s)).toString

  test("ASCII fast path returns the input object unchanged (zero-copy)") {
    val u = UTF8String.fromString("plain ascii text, no change needed 123!")
    assert(ExprKernels.nfc(u) eq u)
  }

  test("decomposed sequences compose: latin accents and Hangul jamo") {
    // e + combining acute (U+0301) -> U+00E9; n + combining tilde -> U+00F1
    assert(nfcOf("cafe\u0301") == "caf\u00e9")
    assert(nfcOf("man\u0303ana") == "ma\u00f1ana")
    // Hangul LV composition: U+1100 U+1161 -> U+AC00
    assert(nfcOf("\u1100\u1161") == "\uac00")
  }

  test("already-composed and non-composable input is unchanged") {
    assert(nfcOf("caf\u00e9") == "caf\u00e9")
    // x + combining acute has no composed form -- NFC keeps the sequence
    assert(nfcOf("x\u0301") == "x\u0301")
    // NFC does NOT do compatibility folding (that's NFKC): full-width
    // letters (U+FF21..) and the fi ligature (U+FB01) stay as-is
    assert(nfcOf("\uff21\uff22") == "\uff21\uff22")
    assert(nfcOf("\ufb01le") == "\ufb01le")
  }

  test("idempotent and stable through the column expression") {
    val cases = Seq("cafe\u0301", "caf\u00e9", "x\u0301",
      "\u1100\u1161", "mixed ascii caf\u00e9 and cafe\u0301 \uff21", "")
    cases.foreach { s => assert(nfcOf(nfcOf(s)) == nfcOf(s)) }
    val df = cases.toDF("s").select(native.nfc($"s").as("n"))
    assert(df.as[String].collect().toSeq == cases.map(nfcOf))
  }

  test("null passes through the expression") {
    val df = Seq[(java.lang.Long, String)]((1L, null)).toDF("id", "s")
    assert(df.select(native.nfc($"s")).collect().head.isNullAt(0))
  }
}
