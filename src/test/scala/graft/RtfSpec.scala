package graft

import graft.core._
import graft.extract.{RtfExtractor, RawDoc}
import org.scalatest.funsuite.AnyFunSuite

class RtfSpec extends AnyFunSuite {
  test("rtf: control words stripped, destinations skipped, escapes decoded") {
    val rtf = "{\\rtf1\\ansi{\\fonttbl{\\f0 Helvetica;}}" +
      "{\\info{\\title Hidden}}\\f0\\fs24 Hello \\b bold\\b0  caf\\" + "'e9 " +
      "{\\*\\themedata junk} \\" + "u196?nd\\par second line\\par}"
    val res = RtfExtractor.extract(RawDoc("t", "d.rtf", "text/rtf", rtf.getBytes("windows-1252")))
    assert(res.status == ExtractionResult.Success)
    val text = res.spans.head.text
    assert(text.contains("Hello bold café"))
    assert(text.contains("Änd"))
    assert(text.contains("second line"))
    assert(!text.contains("Helvetica") && !text.contains("Hidden") && !text.contains("junk"))
  }

  test("rtf routes via extension and via sniffed mime") {
    val rtf = "{\\rtf1 plain words\\par}".getBytes
    assert(graft.classify.Classifier.auction("d.rtf", "", rtf)
      .map(_.ingestor) == Right("DocumentIngestor"))
    assert(graft.classify.Classifier.auction("noext", "", rtf)
      .map(_.ingestor) == Right("DocumentIngestor"))
  }

  test("non-rtf legacy office still fails cleanly") {
    val res = RtfExtractor.extract(RawDoc("t", "d.doc", "application/msword",
      Array[Byte](0xd0.toByte, 0xcf.toByte, 0x11.toByte, 0xe0.toByte)))
    assert(res.status == ExtractionResult.Failure)
  }
}
