package graft

import graft.extract.{AccessExtractor, Jet, Jet4Writer, RawDoc}
import org.scalatest.funsuite.AnyFunSuite

/** Jet4 (.mdb, Access 2000-2003) reader against the in-repo writer — no
  * public Jet4 fixture ships with the reference (Books_be.mdb is Jet3, see
  * FixtureSpec), so reader and writer pin each other against the published
  * mdbtools layout, the same evidence shape as PstSpec. */
class AccessSpec extends AnyFunSuite {

  test("jet4 roundtrip: table name, rows, unicode UCS-2 text") {
    val mdb = Jet4Writer.write("Récords", 3, Seq(
      Seq("alpha", "beta", "gamma"),
      Seq("Grüße", "Київ", "東京")))
    assert(Jet.isJet4(mdb) && !Jet.isJet3(mdb))
    val tables = Jet.parse(mdb)
    assert(tables.map(_.name) == Vector("Récords"))
    assert(tables.head.cols.map(_.name) == Vector("c0", "c1", "c2"))
    assert(tables.head.rows == Vector(
      Vector("alpha", "beta", "gamma"),
      Vector("Grüße", "Київ", "東京")))
  }

  test("jet4: trailing null cells decode empty, row survives") {
    val mdb = Jet4Writer.write("docs", 5, Seq(
      Seq("a", "b", "c", "d", "e"),
      Seq("tail", "short")))
    val rows = Jet.parse(mdb).head.rows
    assert(rows(1) == Vector("tail", "short", "", "", ""))
    val r = AccessExtractor.extract(RawDoc("d", "x.mdb", "", mdb))
    assert(r.status == graft.core.ExtractionResult.Success, r.error)
    assert(r.properties("sheets") == Seq("docs"))
    assert(r.properties("rowCount") == Seq("3")) // 2 rows + header
    assert(r.spans.map(_.text) == Vector("a b c d e", "tail short"))
  }

  test("jet4: multi-page table (rows spill past one 4096-byte page)") {
    val rows = (0 until 400).map(i => Seq(s"token$i", "x" * 30))
    val mdb = Jet4Writer.write("big", 2, rows)
    assert(mdb.length > 3 * 4096)
    val got = Jet.parse(mdb).head.rows
    assert(got.size == 400)
    assert(got(0) == Vector("token0", "x" * 30))
    assert(got(399) == Vector("token399", "x" * 30))
  }

  test("ACE (.accdb, versions 2-5) parses via the Jet4-compatible layout") {
    // every documented ACE version byte roundtrips through the Jet4 path,
    // with the real-world "Standard ACE DB" header magic
    for (v <- 2 to 5) {
      val mdb = Jet4Writer.write("docs", 1, Seq(Seq("ace row")))
      mdb(0x14) = v.toByte
      System.arraycopy("Standard ACE DB".getBytes("ISO-8859-1"), 0, mdb, 4, 15)
      assert(Jet.parse(mdb).head.rows == Vector(Vector("ace row")), s"v$v")
      val r = AccessExtractor.extract(RawDoc("d", "x.accdb", "", mdb))
      assert(r.status == graft.core.ExtractionResult.Success, s"v$v")
    }
  }

  test("unknown Access format versions (>5) fail cleanly") {
    val mdb = Jet4Writer.write("docs", 1, Seq(Seq("a")))
    mdb(0x14) = 0x09
    val r = AccessExtractor.extract(RawDoc("d", "x.accdb", "", mdb))
    assert(r.status == graft.core.ExtractionResult.Failure)
    assert(r.error.contains("unknown format version"))
  }

  test("jet4 'compressed' UCS-2 text decodes (FF FE marker, 0x00 toggle)") {
    // hand-build a one-row table, then patch its var cell to the
    // compressed encoding of "ab✓c": ff fe 'a' 'b' 00 <U+2713 LE> 00 00 'c'
    val plain = Jet4Writer.write("docs", 1, Seq(Seq("ab✓c")))
    val compressed = Array[Byte](0xff.toByte, 0xfe.toByte, 'a', 'b', 0x00,
      0x13, 0x27, 0x00, 0x00, 'c')
    // the plain UCS-2 cell is 8 bytes; compressed is 10 — rebuild via the
    // writer with a same-length placeholder, then splice
    val placeholder = Jet4Writer.write("docs", 1, Seq(Seq("PLACE")))
    val cell = "PLACE".getBytes("UTF-16LE")
    val idx = indexOf(placeholder, cell)
    assert(idx > 0)
    val patched = placeholder.clone()
    System.arraycopy(compressed, 0, patched, idx, compressed.length)
    assert(cell.length == compressed.length, "splice must preserve layout")
    assert(Jet.parse(patched).head.rows == Vector(Vector("ab✓c")))
    assert(Jet.parse(plain).head.rows == Vector(Vector("ab✓c")))
  }

  private def indexOf(hay: Array[Byte], needle: Array[Byte]): Int = {
    var i = 0
    while (i + needle.length <= hay.length) {
      if (hay.slice(i, i + needle.length).sameElements(needle)) return i
      i += 1
    }
    -1
  }
}
