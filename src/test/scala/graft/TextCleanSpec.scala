package graft

import org.apache.spark.sql.functions._
import graft.operators.TextClean

/** PII masking + whitespace normalization: pattern hits, masking order,
  * no-op on clean text. */
class TextCleanSpec extends SparkSpec {
  import spark.implicits._

  private def scrubOne(text: String): (Int, Int, Int, String) = {
    val r = TextClean.scrub(Seq((1L, text)).toDF("doc_id", "text"))
      .select("n_emails", "n_ips", "n_phones", "clean_text")
      .as[(Int, Int, Int, String)].head()
    r
  }

  test("email, ip and phone each mask to their placeholder") {
    val (e, i, p, t) =
      scrubOne("mail a.b+c@x.org ip 10.0.0.255 tel +4915112345678 end")
    assert((e, i, p) == (1, 1, 1))
    assert(t == "mail <EMAIL> ip <IP> tel <PHONE> end")
  }

  test("email masks before ip/phone so its digits never double-mask") {
    // the email contains dotted digits and a plus-digit run; only the
    // EMAIL placeholder must come out
    val (_, _, _, t) = scrubOne("x 1.2.3.4+55555555@mail.com y")
    assert(t == "x <EMAIL> y", t)
  }

  test("whitespace runs collapse and edges trim") {
    val (_, _, _, t) = scrubOne("  a   b  c ")
    assert(t == "a b c")
  }

  test("vertical tab normalizes like the other whitespace (explicit class, not \\s)") {
    // Java's \s includes U+000B but RE2's does not — the explicit run
    // class keeps both engines byte-identical on \x0B-bearing corpora
    val (_, _, _, t) = scrubOne("a\u000B b\t c\n d")
    assert(t == "a b c d", t)
  }

  test("clean text passes through unchanged") {
    val (e, i, p, t) = scrubOne("plain words only")
    assert((e, i, p) == (0, 0, 0))
    assert(t == "plain words only")
  }

  test("version-ish dotted numbers inside words do not match the ip pattern") {
    // 1.2.3.4000 — last octet exceeds 3 digits so \b\d{1,3}\b fails there
    val (_, ips, _, t) = scrubOne("release 1.2.3.4000 notes")
    assert(ips == 0)
    assert(t == "release 1.2.3.4000 notes")
  }

  test("counts are per-occurrence, not per-doc") {
    val (e, _, _, _) = scrubOne("a@b.com c@d.net e@f.org")
    assert(e == 3)
  }
}
