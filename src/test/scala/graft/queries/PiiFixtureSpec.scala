package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** text_pii_redact's corpus query proves the cross-engine redaction path
  * on constructed contact strings; this fixture proves the PATTERNS
  * discriminate on realistic text — multiple PII items per document,
  * boundary cases that must NOT match, and the chain-positional count
  * contract (digits inside an already-redacted email/IP never counted
  * twice). Mirrors the multilingual langid fixture pattern.
  */
class PiiFixtureSpec extends SparkSuite {

  // the PRODUCTION patterns — a private copy here could silently drift
  // from what text_pii_redact actually runs
  private val EmailRe = graft.functions.Curation.EmailRe
  private val Ipv4Re = graft.functions.Curation.Ipv4Re
  private val LongNumRe = graft.functions.Curation.LongNumRe

  private def redact(texts: Seq[String]) = {
    import spark.implicits._
    texts.zipWithIndex.map(_.swap).toDF("id", "t")
      .withColumn("r1", regexp_replace($"t", EmailRe, "<EMAIL>"))
      .withColumn("r2", regexp_replace($"r1", Ipv4Re, "<IP>"))
      .select($"id",
        regexp_replace($"r2", LongNumRe, "<NUM>").as("redacted"),
        regexp_count($"t", lit(EmailRe)).as("n_email"),
        regexp_count($"r1", lit(Ipv4Re)).as("n_ip"),
        regexp_count($"r2", lit(LongNumRe)).as("n_longnum"))
      .orderBy($"id").collect()
  }

  test("redacts realistic emails, IPs, and long ids — including several per doc") {
    val rows = redact(Seq(
      "Contact jane.doe+spam@sub.example.co.uk or bob_99@corp.io today",
      "server at 10.0.255.7 fell back to 192.168.1.1 overnight",
      "order 12345678 shipped; tracking 00991122334455 attached",
      "mixed: root@a.de from 172.16.9.30 ref 7654321"))
    assert(rows(0).getString(1) == "Contact <EMAIL> or <EMAIL> today")
    assert(rows(0).getInt(2) == 2 && rows(0).getInt(3) == 0 && rows(0).getInt(4) == 0)
    assert(rows(1).getString(1) == "server at <IP> fell back to <IP> overnight")
    assert(rows(1).getInt(3) == 2)
    assert(rows(2).getString(1) == "order <NUM> shipped; tracking <NUM> attached")
    assert(rows(2).getInt(4) == 2)
    assert(rows(3).getString(1) == "mixed: <EMAIL> from <IP> ref <NUM>")
    assert(rows(3).getInt(2) == 1 && rows(3).getInt(3) == 1 && rows(3).getInt(4) == 1)
  }

  test("non-PII lookalikes survive: short numbers, version strings, bare at-words") {
    val rows = redact(Seq(
      "version 1.2.3 of lib@local stays; build 4321 too",
      "meet @ noon; price is 12.50; room 101"))
    // "1.2.3" has 3 octets (needs 4); "lib@local" has no dot-TLD;
    // "4321" is under 7 digits — all untouched
    assert(rows(0).getString(1) == "version 1.2.3 of lib@local stays; build 4321 too")
    assert(rows(1).getString(1) == "meet @ noon; price is 12.50; room 101")
    rows.foreach { r =>
      assert(r.getInt(2) == 0 && r.getInt(3) == 0 && r.getInt(4) == 0, r.toString)
    }
  }

  test("chain-positional counts: ip/longnum digits inside an email are not re-counted") {
    val rows = redact(Seq("write 10.1.2.3@host.com plus 1234567@id.org now"))
    // both are syntactically emails (local parts "10.1.2.3", "1234567") —
    // the email pass consumes them; later passes see only placeholders
    assert(rows(0).getString(1) == "write <EMAIL> plus <EMAIL> now")
    assert(rows(0).getInt(2) == 2, "two emails")
    assert(rows(0).getInt(3) == 0, "no ip left after email redaction")
    assert(rows(0).getInt(4) == 0, "no long number left after email redaction")
  }
}
