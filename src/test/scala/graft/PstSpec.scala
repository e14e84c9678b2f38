package graft

import graft.extract.{Pst, PstExtractor, RawDoc}
import org.scalatest.funsuite.AnyFunSuite

/** Unicode PST reader ([MS-PST]) against both the in-repo writer (crypt
  * none, full text) and the reference's real permute-encrypted fixture
  * (structural assertions). */
class PstSpec extends AnyFunSuite {

  test("roundtrip: written PST yields one eml child per message") {
    val pst = Pst.write("Inbox", Seq(
      ("Quarterly report", "alice@x.test", "the numbers are up"),
      ("Re: lunch", "bob@x.test", "how about noon?")))
    val r = PstExtractor.extract(RawDoc("d", "a.pst", "", pst))
    assert(r.status == graft.core.ExtractionResult.Success, r.error)
    assert(r.schema == "Package")
    assert(r.properties("messageCount") == Seq("2"))
    assert(r.properties("folderCount") == Seq("1"))
    assert(r.children.length == 2)
    assert(r.children(0).file_name == "Inbox/0.eml")
    val eml0 = new String(r.children(0).bytes, "UTF-8")
    assert(eml0.contains("Subject: Quarterly report"))
    assert(eml0.contains("From: alice@x.test"))
    assert(eml0.contains("the numbers are up"))
    val eml1 = new String(r.children(1).bytes, "UTF-8")
    assert(eml1.contains("Subject: Re: lunch"))
  }

  test("parse: property context decodes unicode strings and longs") {
    val pst = Pst.write("काम", Seq(("Grüße aus Köln", "s@x.test", "Ünïcödé body ✓")))
    val p = Pst.parse(pst)
    assert(p.cryptMethod == 0)
    val folder = p.folders.head
    assert(p.props(folder.nid)(0x3001).str == "काम")
    assert(p.props(folder.nid)(0x3602).inline == 1L) // content count, PT_LONG
    val msg = p.messages.head
    assert(p.props(msg.nid)(0x0037).str == "Grüße aus Köln")
    assert(p.props(msg.nid)(0x1000).str == "Ünïcödé body ✓")
    assert(p.props(msg.nid)(0x001a).str == "IPM.Note")
    assert(msg.nidParent == folder.nid)
  }

  test("multi-page b-trees: 40 messages split NBT/BBT leaves") {
    val msgs = (0 until 40).map(i => (s"Subject $i", s"s$i@x.test", s"body $i"))
    val r = PstExtractor.extract(RawDoc("d", "big.pst", "", Pst.write("Big", msgs)))
    assert(r.status == graft.core.ExtractionResult.Success, r.error)
    assert(r.children.length == 40)
    assert(new String(r.children(39).bytes, "UTF-8").contains("Subject 39"))
  }

  test("subject prefix-control byte is stripped ([MS-PST] 2.5.3.1.1.1)") {
    assert(Pst.cleanSubject("Re: hello") == "Re: hello")
    assert(Pst.cleanSubject("plain") == "plain")
    assert(Pst.cleanSubject("") == "")
  }

  test("real fixture: permute-encrypted testPST.pst parses structurally") {
    val f = new java.io.File("/root/reference/tests/fixtures/testPST.pst")
    assume(f.isFile)
    val bytes = java.nio.file.Files.readAllBytes(f.toPath)
    val p = Pst.parse(bytes)
    assert(p.cryptMethod == 1) // NDB_CRYPT_PERMUTE
    assert(p.messages.nonEmpty, "expected at least one message node")
    assert(p.folders.nonEmpty)
    // totality + the reference's own test contract (test_outlookpst.py:9-12):
    // status success, schema Package
    val r = PstExtractor.extract(RawDoc("d", "testPST.pst", "", bytes))
    assert(r.status == graft.core.ExtractionResult.Success, r.error)
    assert(r.schema == "Package")
    assert(r.properties("messageCount").head.toInt == p.messages.size)
    assert(r.properties("encoding") == Seq("ndb-crypt-1"))
  }

  test("garbage and truncation fail cleanly") {
    val garbage = Array.fill[Byte](1024)(0x41)
    assert(PstExtractor.extract(RawDoc("d", "x.pst", "", garbage)).status ==
      graft.core.ExtractionResult.Failure)
    val pst = Pst.write("Inbox", Seq(("s", "f@x.test", "b")))
    for (cut <- Seq(100, 600, pst.length - 64, pst.length - 3)) {
      val r = PstExtractor.extract(RawDoc("d", "x.pst", "", pst.take(cut)))
      assert(r.status == graft.core.ExtractionResult.Success ||
        r.status == graft.core.ExtractionResult.Failure)
    }
  }
}
