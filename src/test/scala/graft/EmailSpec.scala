package graft

import graft.core._
import graft.extract._
import org.scalatest.funsuite.AnyFunSuite

/** MIME/EML/mbox semantics vs the reference
  * (`email/msg.py`, `support/email.py`, `email/mbox.py`). */
class EmailSpec extends AnyFunSuite {

  private def extract(eml: String) =
    EmlExtractor.extract(RawDoc("t", "m.eml", "message/rfc822", eml.getBytes("UTF-8")))

  test("simple plain email: headers + body") {
    val eml =
      "From: Alice Wonder <alice@example.com>\r\n" +
        "To: bob@example.com\r\n" +
        "Subject: Hello there\r\n" +
        "Date: Mon, 3 Feb 2020 10:30:00 +0000\r\n" +
        "Message-ID: <abc123@example.com>\r\n" +
        "Content-Type: text/plain; charset=utf-8\r\n\r\n" +
        "This is the body.\r\n"
    val res = extract(eml)
    assert(res.status == ExtractionResult.Success)
    assert(res.properties("subject") == Seq("Hello there"))
    assert(res.properties("date") == Seq("2020-02-03T10:30:00"))
    assert(res.properties("messageId") == Seq("abc123@example.com"))
    assert(res.properties("from") == Seq("Alice Wonder <alice@example.com>"))
    assert(res.properties("to") == Seq("bob@example.com"))
    assert(res.properties("emitters") == Seq("alice@example.com"))
    assert(res.properties("recipients") == Seq("bob@example.com"))
    assert(res.spans.map(_.kind) == Vector("text"))
    assert(res.spans.head.text.trim == "This is the body.")
  }

  test("multipart/alternative: html wins bodyHtml, text wins bodyText (msg.py:51-66)") {
    val eml =
      "Subject: Alt\r\nMIME-Version: 1.0\r\n" +
        "Content-Type: multipart/alternative; boundary=\"B\"\r\n\r\n" +
        "--B\r\nContent-Type: text/plain; charset=utf-8\r\n\r\nplain body\r\n" +
        "--B\r\nContent-Type: text/html; charset=utf-8\r\n\r\n<p>html <b>body</b></p>\r\n" +
        "--B--\r\n"
    val res = extract(eml)
    // text part contributes bodyText; html part does NOT (alternative present)
    assert(res.properties("bodyText").map(_.trim) == Seq("plain body"))
    // html part contributes bodyHtml; no synthesized duplicate from the text part
    assert(res.properties("bodyHtml").exists(_.contains("<b>")))
    assert(res.properties("bodyHtml").size == 1)
    assert(res.spans.map(_.kind) == Vector("text"))
  }

  test("html-only email: bodyText extracted from DOM walk") {
    val eml = "Subject: H\r\nContent-Type: text/html\r\n\r\n<html><body><p>hello html</p></body></html>\r\n"
    val res = extract(eml)
    assert(res.properties("bodyText") == Seq("hello html"))
  }

  test("base64 attachment becomes child + media span (support/email.py:57-79)") {
    val payload = "attached content"
    val b64 = java.util.Base64.getEncoder.encodeToString(payload.getBytes)
    val eml =
      "Subject: Att\r\nMIME-Version: 1.0\r\n" +
        "Content-Type: multipart/mixed; boundary=\"M\"\r\n\r\n" +
        "--M\r\nContent-Type: text/plain\r\n\r\ncover note\r\n" +
        "--M\r\nContent-Type: application/octet-stream; name=\"file.bin\"\r\n" +
        "Content-Disposition: attachment; filename=\"file.bin\"\r\n" +
        "Content-Transfer-Encoding: base64\r\n\r\n" + b64 + "\r\n" +
        "--M--\r\n"
    val res = extract(eml)
    assert(res.children.map(_.file_name) == Vector("file.bin"))
    assert(new String(res.children.head.bytes) == payload)
    assert(res.spans.map(_.kind) == Vector("text", "media"))
  }

  test("quoted-printable body decoded") {
    val eml = "Subject: QP\r\nContent-Type: text/plain; charset=utf-8\r\n" +
      "Content-Transfer-Encoding: quoted-printable\r\n\r\n" +
      "caf=C3=A9 line=\r\n continues\r\n"
    val res = extract(eml)
    assert(res.properties("bodyText").head.contains("café"))
    assert(res.properties("bodyText").head.contains("line continues"))
  }

  test("rfc2047 encoded subject decoded") {
    val eml = "Subject: =?utf-8?B?" +
      java.util.Base64.getEncoder.encodeToString("Grüße".getBytes("UTF-8")) +
      "?=\r\n\r\nbody\r\n"
    assert(extract(eml).properties("subject") == Seq("Grüße"))
  }

  test("references beats in-reply-to; short ids dropped (support/email.py:125-146)") {
    assert(EmlExtractor.parseReferences(
      Seq("<a@x> <second-ref@x>"), Seq("<irt@x>")) == Some("second-ref@x"))
    assert(EmlExtractor.parseReferences(Seq(), Seq("<irt9@x>")) == Some("irt9@x"))
    assert(EmlExtractor.parseMessageIds(Seq("<abc>")) == Seq.empty) // len <= 4
  }

  test("mbox: one eml child per From-delimited message (email/mbox.py)") {
    val m1 = "Subject: one\r\n\r\nfirst\r\n"
    val m2 = "Subject: two\r\n\r\nsecond\r\n"
    val mbox = s"From a@x Mon Jan 1 00:00:00 2020\n$m1\nFrom b@x Mon Jan 1 00:00:01 2020\n$m2"
    val res = MboxExtractor.extract(RawDoc("t", "in.mbox", "application/mbox", mbox.getBytes))
    assert(res.status == ExtractionResult.Success)
    assert(res.children.size == 2)
    assert(res.children.map(_.mime_hint).toSet == Set("message/rfc822"))
    val c1 = EmlExtractor.extract(RawDoc("c", "1.eml", "message/rfc822", res.children(0).bytes))
    assert(c1.properties("subject") == Seq("one"))
  }

  test("emlx: length-prefixed rfc822 (email/emlx.py)") {
    val inner = "Subject: apple\r\n\r\nmail body\r\n"
    val emlx = s"${inner.getBytes.length}\n$inner<plist>ignored</plist>"
    val res = EmlxExtractor.extract(RawDoc("t", "1.emlx", "", emlx.getBytes))
    assert(res.properties("subject") == Seq("apple"))
  }

  test("nested message/rfc822 rendered as header block (msg.py:68-80)") {
    val eml =
      "Subject: Outer\r\nContent-Type: multipart/mixed; boundary=\"X\"\r\n\r\n" +
        "--X\r\nContent-Type: message/rfc822\r\n\r\n" +
        "From: inner@x.com\r\nSubject: Inner Subject\r\n\r\ninner body\r\n" +
        "--X--\r\n"
    val res = extract(eml)
    val bt = res.properties("bodyText")
    assert(bt.exists(t => t.contains("Subject: Inner Subject") && t.contains("From: inner@x.com")))
    assert(bt.exists(_.contains("inner body")))
  }
}
