package graft.queries

import graft.SparkSuite

/** Real multilingual sentences pin that the trigram classifier actually
  * DISCRIMINATES languages. The oracle-checked `text_langid_ngram` run on
  * the synthetic corpus can only pin the scoring mechanics (TextOps notes
  * the corpus text is English-ish regardless of label); these hand-written
  * fixtures — one per profiled latin language, plus a CJK sentence that
  * must fall through to "zh" via the no-latin-trigrams rule — prove the
  * profiles separate real text.
  */
class TextLangFixtureSpec extends SparkSuite {
  import spark.implicits._

  test("trigram classifier assigns the right language to real sentences") {
    val fixtures = Seq(
      (1L, "the quick brown fox jumps over the lazy dog while the children " +
        "are singing in the morning and the wind is rising", "en"),
      (2L, "los niños que viven en la ciudad hablan de los libros que han " +
        "leído durante el verano con los amigos", "es"),
      (3L, "der alte mann und die frau sind schnell durch einen schönen " +
        "wald gegangen und ich singe ein leises lied", "de"),
      (4L, "les enfants jouent dans le jardin des voisins pendant la " +
        "journée et les oiseaux chantent dans les grands arbres", "fr"),
      (5L, "你好世界这是一个测试文档完全没有拉丁字母", "zh"))
    val got = TextOps.classifyLangNgram(
      fixtures.map { case (id, text, _) => (id, text) }.toDF("doc_id", "text"))
      .select("doc_id", "lang_pred").as[(Long, String)].collect().toMap
    fixtures.foreach { case (id, _, want) =>
      assert(got(id) == want, s"doc $id predicted ${got(id)}, want $want")
    }
  }

  test("scores are per-language trigram hit counts, not ties broken by luck") {
    // the German fixture must win on margin, not on the when-chain order
    val row = TextOps.classifyLangNgram(Seq(
      (1L, "der alte mann und die frau sind schnell durch einen schönen " +
        "wald gegangen und ich singe ein leises lied")).toDF("doc_id", "text"))
      .select("ng_en", "ng_es", "ng_de", "ng_fr")
      .as[(Long, Long, Long, Long)].head()
    assert(row._3 > row._1 && row._3 > row._2 && row._3 > row._4,
      s"expected de to win on margin, scores were $row")
  }
}
