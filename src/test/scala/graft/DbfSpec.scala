package graft

import graft.core._
import graft.extract.{DbfExtractor, DbfWriter, RawDoc}
import org.scalatest.funsuite.AnyFunSuite

class DbfSpec extends AnyFunSuite {
  test("dbf roundtrip: fields, rows, deleted-record skip, rowCount quirk") {
    val bytes = DbfWriter.write(
      Seq(("NAME", 10), ("COUNTRY", 10)),
      Seq(Seq("Umberto", "Italy"), Seq("Carlos", "Spain")))
    val res = DbfExtractor.extract(RawDoc("t", "PAK_adm1.dbf", "", bytes))
    assert(res.status == ExtractionResult.Success)
    assert(res.spans.map(_.text) == Vector("Umberto Italy", "Carlos Spain"))
    assert(res.properties("rowCount") == Seq("3"))
    assert(res.properties("columns") == Seq("""["NAME", "COUNTRY"]"""))
  }

  test("dbf: classifier routes by extension") {
    val bytes = DbfWriter.write(Seq(("A", 4)), Seq(Seq("x")))
    assert(graft.classify.Classifier.auction("data.dbf", "", bytes)
      .map(_.ingestor) == Right("DBFIngestor"))
  }

  test("dbf: garbage fails cleanly") {
    val res = DbfExtractor.extract(RawDoc("t", "x.dbf", "", Array[Byte](3, 1, 1)))
    assert(res.status == ExtractionResult.Failure)
  }
}
