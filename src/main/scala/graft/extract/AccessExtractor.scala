package graft.extract

import graft.core._
import graft.core.TextUtil.filterText

/** From-scratch Access / Jet3 (.mdb, Access 97) reader — the reference
  * shells out to mdb-tables/mdb-export
  * (`/root/reference/ingestors/tabular/access.py:29-55`); the Jet format
  * is publicly documented (mdbtools' HACKING spec). Scope:
  *
  *  - 2048-byte Jet3 pages; table catalog bootstrapped from MSysObjects
  *    (TDEF page 2) — user tables are Type 1 / Flags 0 rows whose Id is
  *    the table's TDEF page;
  *  - data pages discovered by their owner-TDEF back-pointer (byte 4 of
  *    every 0x01 page) — no usage-map walk needed for read-only scans;
  *  - TDEF chains (next-page pointer), 18-byte column defs, fixed +
  *    1-byte-offset variable columns, null-mask booleans;
  *  - types: bool/byte/int/long/currency/float/double/datetime/text;
  *    memo & OLE render empty (LVAL pages out of scope).
  *
  * Jet4 (Access 2000+, version byte ≥ 1) has different structures and no
  * fixture to validate against — it fails cleanly. Rows longer than 255
  * bytes use Jet3 jump tables; their variable columns decode as null
  * (fixed columns still read), documented limitation. */
object Jet3 {

  final case class Col(name: String, typ: Int, colnum: Int, offV: Int,
                       flags: Int, offF: Int, size: Int) {
    def isFixed: Boolean = (flags & 1) != 0
  }
  final case class Table(name: String, cols: Vector[Col],
                         rows: Vector[Vector[String]])

  private val PageSize = 2048

  private def u16(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
  private def i32(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) |
      ((b(o + 2) & 0xff) << 16) | ((b(o + 3) & 0xff) << 24)
  private def i64(b: Array[Byte], o: Int): Long =
    (i32(b, o).toLong & 0xffffffffL) | (i32(b, o + 4).toLong << 32)

  def isJet(b: Array[Byte]): Boolean =
    b.length > 128 &&
      new String(b, 4, 15, "ISO-8859-1") == "Standard Jet DB"

  def isJet3(b: Array[Byte]): Boolean = isJet(b) && (b(0x14) & 0xff) == 0

  def parse(d: Array[Byte]): Vector[Table] = {
    if (!isJet(d)) throw new ProcessingError("Not an Access database")
    if (!isJet3(d))
      throw new ProcessingError(
        "Access extraction supports Jet3 (.mdb, Access 97) only in this build")
    val nPages = d.length / PageSize

    // TDEF payload: first page from 0, continuation pages contribute
    // bytes 8.. (next pointer at offset 4 of each TDEF page)
    def tdefBytes(pg: Int): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      var p = pg
      var guard = 0
      while (p > 0 && p < nPages && guard < 64) {
        val off = p * PageSize
        if ((d(off) & 0xff) != 0x02)
          return out.toByteArray
        if (guard == 0) out.write(d, off, PageSize)
        else out.write(d, off + 8, PageSize - 8)
        p = i32(d, off + 4)
        guard += 1
      }
      out.toByteArray
    }

    def tdefCols(pg: Int): Vector[Col] = {
      val t = tdefBytes(pg)
      if (t.length < 64) return Vector.empty
      val numRealIdx = i32(t, 31)
      val numCols = u16(t, 25)
      if (numCols <= 0 || numCols > 256 || numRealIdx < 0 || numRealIdx > 64)
        return Vector.empty
      val start = 35 + 8 + numRealIdx * 8
      if (start + numCols * 18 > t.length) return Vector.empty
      val defs = (0 until numCols).map { c =>
        val co = start + c * 18
        Col("", t(co) & 0xff, u16(t, co + 1), u16(t, co + 3),
          t(co + 13) & 0xff, u16(t, co + 14), u16(t, co + 16))
      }.toVector
      var p = start + numCols * 18
      defs.map { c =>
        if (p >= t.length) c
        else {
          val ln = t(p) & 0xff
          val name =
            if (p + 1 + ln <= t.length) new String(t, p + 1, ln, "ISO-8859-1")
            else ""
          p += 1 + ln
          c.copy(name = name)
        }
      }
    }

    /** All data pages owned by the given TDEF page. */
    def dataPages(tdefPg: Int): Vector[Int] =
      (0 until nPages).filter { p =>
        (d(p * PageSize) & 0xff) == 0x01 && i32(d, p * PageSize + 4) == tdefPg
      }.toVector

    /** Decode one row against the column catalog. */
    def crackRow(row: Array[Byte], cols: Vector[Col]): Vector[String] = {
      if (row.isEmpty) return Vector.empty
      val ncols = row(0) & 0xff
      val maskSz = (ncols + 7) / 8
      if (row.length < 1 + maskSz) return Vector.empty
      val maskOff = row.length - maskSz
      def bit(i: Int): Boolean =
        (row(maskOff + i / 8) >> (i % 8) & 1) != 0
      val nvarDeclared = cols.count(!_.isFixed)
      val smallRow = row.length <= 255
      val nvar = if (nvarDeclared > 0 && smallRow) row(maskOff - 1) & 0xff else 0
      def varOff(i: Int): Int = row(maskOff - 2 - i) & 0xff

      cols.map { c =>
        val i = c.colnum
        if (c.typ == 1) { // boolean lives in the mask
          if (bit(i)) "1" else "0"
        } else if (i < ncols && !bit(i)) "" // NULL
        else {
          val raw: Array[Byte] =
            if (c.isFixed) {
              val o = 1 + c.offF
              if (o + c.size <= row.length) row.slice(o, o + c.size)
              else Array.empty
            } else if (smallRow && c.offV < nvar) {
              val a = varOff(c.offV)
              val b = varOff(c.offV + 1)
              if (a <= b && b <= row.length) row.slice(a, b) else Array.empty
            } else Array.empty // jump-table row: var cols skipped
          render(c.typ, raw)
        }
      }
    }

    def render(typ: Int, raw: Array[Byte]): String = typ match {
      case _ if raw.isEmpty => ""
      case 2 => (raw(0) & 0xff).toString
      case 3 => if (raw.length >= 2) u16(raw, 0).toShort.toString else ""
      case 4 => if (raw.length >= 4) i32(raw, 0).toString else ""
      case 5 => // currency: scaled 1e4 int64
        if (raw.length >= 8) {
          val v = i64(raw, 0)
          val whole = v / 10000
          val frac = math.abs(v % 10000)
          if (frac == 0) whole.toString else s"$whole.${f"$frac%04d".reverse.dropWhile(_ == '0').reverse}"
        } else ""
      case 6 =>
        if (raw.length >= 4)
          java.lang.Float.intBitsToFloat(i32(raw, 0)).toString else ""
      case 7 =>
        if (raw.length >= 8)
          java.lang.Double.longBitsToDouble(i64(raw, 0)).toString else ""
      case 8 => // datetime: fractional days since 1899-12-30
        if (raw.length >= 8) {
          val days = java.lang.Double.longBitsToDouble(i64(raw, 0))
          val whole = math.floor(days).toLong
          val secs = math.round(math.abs(days - whole) * 86400)
          val date = java.time.LocalDate.of(1899, 12, 30).plusDays(whole)
          val t = java.time.LocalTime.ofSecondOfDay(math.min(secs, 86399))
          if (secs == 0) date.toString else s"${date}T$t"
        } else ""
      case 10 => new String(raw, "ISO-8859-1")
      case _ => "" // binary/memo/OLE/GUID: LVAL resolution out of scope
    }

    def tableRows(tdefPg: Int, cols: Vector[Col]): Vector[Vector[String]] = {
      val rows = Vector.newBuilder[Vector[String]]
      for (p <- dataPages(tdefPg)) {
        val off = p * PageSize
        val nRows = u16(d, off + 8)
        if (nRows > 0 && nRows < PageSize / 2) {
          var prevEnd = PageSize
          for (r <- 0 until nRows) {
            val rawOff = u16(d, off + 10 + 2 * r)
            val start = rawOff & 0x1fff
            val deleted = (rawOff & 0x8000) != 0
            val overflow = (rawOff & 0x4000) != 0
            if (!deleted && !overflow && start < prevEnd && start >= 0) {
              val row = d.slice(off + start, off + prevEnd)
              val cracked = crackRow(row, cols)
              if (cracked.nonEmpty) rows += cracked
            }
            if (start > 0 && start < prevEnd) prevEnd = start
          }
        }
      }
      rows.result()
    }

    // bootstrap: MSysObjects at TDEF page 2 lists every object
    val sysCols = tdefCols(2)
    if (sysCols.isEmpty)
      throw new ProcessingError("Access: cannot read MSysObjects catalog")
    val idIx = sysCols.indexWhere(_.name == "Id")
    val nameIx = sysCols.indexWhere(_.name == "Name")
    val typeIx = sysCols.indexWhere(_.name == "Type")
    val flagsIx = sysCols.indexWhere(_.name == "Flags")
    if (idIx < 0 || nameIx < 0 || typeIx < 0)
      throw new ProcessingError("Access: unexpected MSysObjects layout")

    val userTables = tableRows(2, sysCols).flatMap { r =>
      val name = r(nameIx)
      val objType = r(typeIx).toIntOption.getOrElse(-1) & 0x7f
      val flags = if (flagsIx >= 0) r(flagsIx).toLongOption.getOrElse(-1L) else 0L
      val id = r(idIx).toLongOption.getOrElse(-1L)
      if (objType == 1 && flags == 0L && !name.startsWith("MSys") &&
          id > 0 && id < nPages) Some(name -> id.toInt)
      else None
    }

    userTables.map { case (name, pg) =>
      val cols = tdefCols(pg)
      Table(name, cols, if (cols.nonEmpty) tableRows(pg, cols) else Vector.empty)
    }
  }
}

/** AccessIngestor: tables → sheets, rows → text spans, Workbook schema —
  * the mdb-export stream re-expressed (`tabular/access.py:43-67`). */
object AccessExtractor extends Extractor {
  val name = "AccessIngestor"
  val schema = "Workbook"

  protected def run(doc: RawDoc): ExtractionResult = {
    val tables = Jet3.parse(doc.bytes)
    if (tables.isEmpty)
      throw new ProcessingError("Access database contains no tables")
    val spans = Vector.newBuilder[Span]
    var rowIdx = 0
    var totalRows = 0
    for (t <- tables; r <- t.rows) {
      if (r.map(_.length).sum != 0) {
        val kept = r.filter(filterText)
        if (kept.nonEmpty)
          spans += Span(SpanKinds.Text, kept.mkString(" "), "", rowIdx)
        rowIdx += 1
        totalRows += 1
      }
    }
    ExtractionResult.success(schema, spans.result(), Map(
      "sheets" -> tables.map(_.name),
      "rowCount" -> Seq((totalRows + 1).toString)))
  }
}
