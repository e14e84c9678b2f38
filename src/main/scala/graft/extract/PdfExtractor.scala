package graft.extract

import graft.core._
import graft.core.TextUtil.filterText

import java.nio.charset.StandardCharsets
import scala.collection.mutable

/** From-scratch PDF layout parser (PDFBox-style, SURVEY §7 hard-part (a)),
  * replacing the reference's PyMuPDF path
  * (`/root/reference/ingestors/documents/pdf.py:10-65`,
  * `support/pdf.py:37-149`):
  *
  *  - object scan (no xref needed — tolerant of linearized/appended files),
  *    dict/array/name/string/stream values, reference resolution;
  *  - /Encrypt in any trailer → the reference's encrypted-file contract
  *    (`tests/test_pdf.py:80-90`, error = ENCRYPTED_MSG);
  *  - page-tree walk (/Root → /Pages → /Kids) in document order;
  *  - content streams (FlateDecode via java.util.zip.Inflater) interpreted
  *    for the text operators (BT/ET, Td/TD/Tm/T*, Tj/TJ/'/"), line breaks
  *    on y-movement — the equivalent of page.get_text(sort=True);
  *  - NFKD normalization of extracted text (`support/pdf.py:120`);
  *  - /Info metadata (Title, Author, dates D:YYYYMMDD... → ISO).
  *
  * Scope: the well-formed simple-font subset our corpus and the reference's
  * text-centric fixtures exercise; Type3/OCR raster pages are out of
  * sandbox scope (the OCR hook would be a media span).
  *
  * Span contract: one kind="page" span per page, text = page text, offset =
  * 1-based page number (mirrors the reference's Page entities with `index`
  * + per-page indexText fragments).
  */
object PdfExtractor extends Extractor {
  val name = "PDFIngestor"
  val schema = "Pages"

  // ---- object model --------------------------------------------------------

  sealed trait PVal
  case class PNum(v: Double) extends PVal
  case class PStr(v: String) extends PVal
  case class PName(v: String) extends PVal
  case class PBool(v: Boolean) extends PVal
  case object PNull extends PVal
  case class PArr(items: Vector[PVal]) extends PVal
  case class PDict(m: Map[String, PVal]) extends PVal
  case class PRef(num: Int, gen: Int) extends PVal
  case class PStream(dict: PDict, raw: Array[Byte]) extends PVal

  private final class Lexer(val s: String) {
    var i = 0
    var depth = 0 // container-nesting counter, bounded in parseVal
    val n: Int = s.length
    def ws(): Unit = {
      var go = true
      while (go && i < n) {
        val c = s.charAt(i)
        if (c == '%') { while (i < n && s.charAt(i) != '\n' && s.charAt(i) != '\r') i += 1 }
        else if (c.isWhitespace || c == 0) i += 1
        else go = false
      }
    }
    def peek: Char = if (i < n) s.charAt(i) else 0.toChar
    def startsWith(t: String): Boolean = s.startsWith(t, i)
  }

  /** Parse one PDF value at lexer position. Container nesting is bounded:
    * a ~100 KB payload of nested `[[[[...` otherwise recurses past the
    * task stack (StackOverflowError escapes the Exception-only totality
    * wrapper). */
  private def parseVal(lx: Lexer): PVal = {
    lx.ws()
    lx.depth += 1
    if (lx.depth > 300)
      throw new ProcessingError("PDF value nesting too deep")
    try {
      val c = lx.peek
      if (lx.startsWith("<<")) parseDict(lx)
      else if (c == '<') parseHexString(lx)
      else if (c == '(') parseLiteralString(lx)
      else if (c == '/') parseName(lx)
      else if (c == '[') {
        lx.i += 1
        val items = Vector.newBuilder[PVal]
        lx.ws()
        while (lx.peek != ']' && lx.i < lx.n) { items += parseVal(lx); lx.ws() }
        lx.i += 1
        PArr(items.result())
      }
      else if (lx.startsWith("true")) { lx.i += 4; PBool(true) }
      else if (lx.startsWith("false")) { lx.i += 5; PBool(false) }
      else if (lx.startsWith("null")) { lx.i += 4; PNull }
      else parseNumberOrRef(lx)
    } finally lx.depth -= 1
  }

  private def parseName(lx: Lexer): PName = {
    lx.i += 1
    val sb = new StringBuilder
    while (lx.i < lx.n && !isDelim(lx.peek)) {
      if (lx.peek == '#' && lx.i + 2 < lx.n) {
        try {
          sb.append(Integer.parseInt(lx.s.substring(lx.i + 1, lx.i + 3), 16).toChar)
          lx.i += 3
        } catch { case _: Exception => sb.append(lx.peek); lx.i += 1 }
      } else { sb.append(lx.peek); lx.i += 1 }
    }
    PName(sb.toString)
  }

  private def isDelim(c: Char): Boolean =
    c.isWhitespace || c == 0 || "()<>[]{}/%".indexOf(c) >= 0

  private def parseNumberOrRef(lx: Lexer): PVal = {
    val start = lx.i
    while (lx.i < lx.n && !isDelim(lx.peek)) lx.i += 1
    val tok = lx.s.substring(start, lx.i)
    val num = tok.toDoubleOption.getOrElse {
      return PNull // unknown keyword — tolerate
    }
    // lookahead: "N G R" is a reference
    val save = lx.i
    lx.ws()
    val s2 = lx.i
    while (lx.i < lx.n && !isDelim(lx.peek)) lx.i += 1
    val tok2 = lx.s.substring(s2, lx.i)
    if (tok2.nonEmpty && tok2.forall(_.isDigit)) {
      lx.ws()
      if (lx.peek == 'R' && (lx.i + 1 >= lx.n || isDelim(lx.s.charAt(lx.i + 1)))) {
        lx.i += 1
        return PRef(num.toInt, tok2.toInt)
      }
    }
    lx.i = save
    PNum(num)
  }

  private def parseDict(lx: Lexer): PVal = {
    lx.i += 2
    val m = Map.newBuilder[String, PVal]
    var go = true
    while (go) {
      lx.ws()
      if (lx.startsWith(">>")) { lx.i += 2; go = false }
      else if (lx.peek == '/') {
        val k = parseName(lx).v
        m += (k -> parseVal(lx))
      } else if (lx.i >= lx.n) go = false
      else lx.i += 1 // skip junk
    }
    PDict(m.result())
  }

  def parseLiteralString(lx: Lexer): PStr = {
    lx.i += 1
    val sb = new StringBuilder
    var depth = 1
    while (depth > 0 && lx.i < lx.n) {
      val c = lx.s.charAt(lx.i)
      c match {
        case '\\' if lx.i + 1 < lx.n =>
          val e = lx.s.charAt(lx.i + 1)
          e match {
            case 'n' => sb.append('\n'); lx.i += 2
            case 'r' => sb.append('\r'); lx.i += 2
            case 't' => sb.append('\t'); lx.i += 2
            case 'b' => sb.append('\b'); lx.i += 2
            case 'f' => sb.append('\f'); lx.i += 2
            case '(' => sb.append('('); lx.i += 2
            case ')' => sb.append(')'); lx.i += 2
            case '\\' => sb.append('\\'); lx.i += 2
            case '\n' => lx.i += 2 // line continuation
            case '\r' =>
              lx.i += 2
              if (lx.i < lx.n && lx.s.charAt(lx.i) == '\n') lx.i += 1
            case d if d >= '0' && d <= '7' =>
              var j = lx.i + 1
              var v = 0
              while (j < lx.n && j < lx.i + 4 && lx.s.charAt(j) >= '0' && lx.s.charAt(j) <= '7') {
                v = v * 8 + (lx.s.charAt(j) - '0'); j += 1
              }
              sb.append(v.toChar); lx.i = j
            case other => sb.append(other); lx.i += 2
          }
        case '(' => depth += 1; sb.append(c); lx.i += 1
        case ')' =>
          depth -= 1
          if (depth > 0) sb.append(c)
          lx.i += 1
        case other => sb.append(other); lx.i += 1
      }
    }
    PStr(sb.toString)
  }

  def parseHexString(lx: Lexer): PStr = {
    lx.i += 1
    val hex = new StringBuilder
    while (lx.i < lx.n && lx.peek != '>') {
      val c = lx.peek
      if (!c.isWhitespace) hex.append(c)
      lx.i += 1
    }
    lx.i += 1
    if (hex.length % 2 == 1) hex.append('0')
    val sb = new StringBuilder
    var j = 0
    while (j + 1 < hex.length + 1 && j + 2 <= hex.length) {
      try sb.append(Integer.parseInt(hex.substring(j, j + 2), 16).toChar)
      catch { case _: Exception => () }
      j += 2
    }
    PStr(sb.toString)
  }

  // ---- document scan -------------------------------------------------------

  final case class PdfDoc(objects: Map[Int, PVal], trailers: Vector[PDict]) {
    def resolve(v: PVal, depth: Int = 0): PVal = v match {
      case PRef(num, _) if depth < 32 =>
        resolve(objects.getOrElse(num, PNull), depth + 1)
      case other => other
    }
    def dictOf(v: PVal): Option[PDict] = resolve(v) match {
      case d: PDict => Some(d)
      case PStream(d, _) => Some(d)
      case _ => None
    }
  }

  // hand-rolled "(\\d+)\\s+(\\d+)\\s+obj\\b" scanner: indexOf("obj") +
  // backtrack over ws/digit runs — the regex findAllMatchIn tried the
  // greedy \\d+ at every byte of the file and was a measured hot spot
  @inline private def isPdfWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\r' || c == '\f' || c == '\u000b'
  @inline private def isWordChar(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') ||
      (c >= '0' && c <= '9') || c == '_'

  /** Object-number start positions: (objNum, index-after-"obj") pairs in
    * document order, matching the former regex semantics exactly. */
  private def objSites(s: String): Iterator[(Int, Int)] = {
    val out = Vector.newBuilder[(Int, Int)]
    var idx = s.indexOf("obj")
    while (idx >= 0) {
      if (idx + 3 >= s.length || !isWordChar(s.charAt(idx + 3))) {
        var q = idx - 1
        val ws2 = q
        while (q >= 0 && isPdfWs(s.charAt(q))) q -= 1
        if (q < ws2) {
          val d2 = q
          while (q >= 0 && s.charAt(q) >= '0' && s.charAt(q) <= '9') q -= 1
          if (q < d2) {
            val ws1 = q
            while (q >= 0 && isPdfWs(s.charAt(q))) q -= 1
            if (q < ws1) {
              val d1 = q
              while (q >= 0 && s.charAt(q) >= '0' && s.charAt(q) <= '9') q -= 1
              if (q < d1)
                out += ((s.substring(q + 1, d1 + 1).toInt, idx + 3))
            }
          }
        }
      }
      idx = s.indexOf("obj", idx + 1)
    }
    out.result().iterator
  }

  def scan(bytes: Array[Byte]): PdfDoc = {
    val s = new String(bytes, StandardCharsets.ISO_8859_1)
    val objects = mutable.Map.empty[Int, PVal]
    for ((num, after) <- objSites(s)) {
      val lx = new Lexer(s)
      lx.i = after
      try {
        val v = parseVal(lx)
        lx.ws()
        val value = if (lx.startsWith("stream")) {
          lx.i += "stream".length
          if (lx.peek == '\r') lx.i += 1
          if (lx.peek == '\n') lx.i += 1
          val dict = v.asInstanceOf[PDict]
          val lenV = dict.m.get("Length")
          val end = lenV match {
            case Some(PNum(len)) if lx.i + len.toInt <= s.length &&
              s.startsWith("endstream", skipWs(s, lx.i + len.toInt)) =>
              lx.i + len.toInt
            case _ =>
              val e = s.indexOf("endstream", lx.i)
              if (e < 0) s.length else e
          }
          val raw = new Array[Byte](end - lx.i)
          var k = 0
          while (k < raw.length) { raw(k) = s.charAt(lx.i + k).toByte; k += 1 }
          PStream(dict, raw)
        } else v
        objects(num) = value
      } catch { case _: Exception => () }
    }
    // trailers: classic `trailer <<...>>` and xref-stream dicts
    val trailers = Vector.newBuilder[PDict]
    var ti = s.indexOf("trailer")
    while (ti >= 0) {
      val lx = new Lexer(s)
      lx.i = ti + "trailer".length
      try {
        parseVal(lx) match {
          case d: PDict => trailers += d
          case _ => ()
        }
      } catch { case _: Exception => () }
      ti = s.indexOf("trailer", ti + 1)
    }
    objects.values.foreach {
      case PStream(d, _) if d.m.get("Type").contains(PName("XRef")) => trailers += d
      case _ => ()
    }

    // PDF 1.5 object streams: most objects of a modern PDF live inside
    // /Type/ObjStm FlateDecode streams — expand them (header = N pairs of
    // "objnum offset", bodies at /First + offset) and merge. A provisional
    // doc is needed because decodeStream resolves indirect /Length refs.
    val provisional = PdfDoc(objects.toMap, trailers.result())
    objects.toMap.values.foreach {
      case st @ PStream(d, _) if d.m.get("Type").contains(PName("ObjStm")) =>
        try {
          val n = provisional.resolve(d.m.getOrElse("N", PNull)) match {
            case PNum(v) => v.toInt
            case _ => 0
          }
          val first = provisional.resolve(d.m.getOrElse("First", PNull)) match {
            case PNum(v) => v.toInt
            case _ => 0
          }
          if (n > 0 && n < 100000) {
            val data = new String(decodeStream(provisional, st),
              StandardCharsets.ISO_8859_1)
            val hdr = new Lexer(data)
            val pairs = (0 until n).map { _ =>
              val a = parseVal(hdr); val b = parseVal(hdr)
              (a, b) match {
                case (PNum(num), PNum(off)) => (num.toInt, off.toInt)
                case _ => (-1, -1)
              }
            }
            for ((num, off) <- pairs if num >= 0 && first + off < data.length
                 if !objects.contains(num)) {
              val lx = new Lexer(data)
              lx.i = first + off
              try objects(num) = parseVal(lx)
              catch { case _: Exception => () }
            }
          }
        } catch { case _: Exception => () }
      case _ => ()
    }
    PdfDoc(objects.toMap, trailers.result())
  }

  private def skipWs(s: String, i0: Int): Int = {
    var i = i0
    while (i < s.length && (s.charAt(i).isWhitespace || s.charAt(i) == 0)) i += 1
    i
  }

  /** Inflate with an output cap: a crafted deflate bomb expands ~1000x per
    * level, so uncapped decompression OOMs the executor JVM. Exceeding the
    * cap is a ProcessingError (→ failure row), mirroring the zip/gzip
    * paths' PackageLimits.readCapped. Truncated/corrupt streams still
    * return the bytes produced so far (partial text beats none). */
  def inflate(raw: Array[Byte], cap: Long = PackageLimits.MaxMemberBytes): Array[Byte] = {
    val inf = new java.util.zip.Inflater()
    inf.setInput(raw)
    val out = new java.io.ByteArrayOutputStream(math.min(raw.length.toLong * 4, 1 << 20).toInt)
    val buf = new Array[Byte](8192)
    try {
      var done = false
      while (!done && !inf.finished()) {
        val k = inf.inflate(buf)
        if (k > 0) {
          if (out.size.toLong + k > cap)
            throw new ProcessingError("FlateDecode output exceeds size cap")
          out.write(buf, 0, k)
        } else done = true
      }
    } catch {
      case e: ProcessingError => throw e
      case _: Exception => ()
    } finally inf.end()
    out.toByteArray
  }

  /** Max filter applications per stream — repeated /Fl entries otherwise
    * multiply the bomb cap per level. */
  private val MaxFilterChain = 4

  def decodeStream(doc: PdfDoc, st: PStream): Array[Byte] = {
    val filters: Seq[String] = doc.resolve(st.dict.m.getOrElse("Filter", PNull)) match {
      case PName(f) => Seq(f)
      case PArr(items) => items.collect { case PName(f) => f }
      case _ => Seq.empty
    }
    filters.take(MaxFilterChain).foldLeft(st.raw) { (bytes, f) =>
      f match {
        case "FlateDecode" | "Fl" => inflate(bytes)
        case _ => bytes // unsupported filter: pass through (text ops absent)
      }
    }
  }

  // ---- page tree -----------------------------------------------------------

  def pagesOf(doc: PdfDoc): Vector[PDict] = {
    val root: Option[PDict] = doc.trailers.flatMap(_.m.get("Root"))
      .flatMap(r => doc.dictOf(r)).headOption
      .orElse(doc.objects.values.flatMap(v => doc.dictOf(v))
        .find(_.m.get("Type").contains(PName("Catalog"))))
    val top = root.flatMap(r => r.m.get("Pages")).flatMap(doc.dictOf)
    val out = Vector.newBuilder[PDict]
    def walk(node: PDict, depth: Int): Unit = {
      if (depth > 64) return
      node.m.get("Type") match {
        case Some(PName("Page")) => out += node
        case _ =>
          doc.resolve(node.m.getOrElse("Kids", PNull)) match {
            case PArr(kids) =>
              kids.foreach(k => doc.dictOf(k).foreach(walk(_, depth + 1)))
            case _ => ()
          }
      }
    }
    top.foreach(walk(_, 0))
    val pages = out.result()
    if (pages.nonEmpty) pages
    else doc.objects.values.flatMap(doc.dictOf(_)).toVector
      .filter(_.m.get("Type").contains(PName("Page")))
  }

  // ---- fonts / ToUnicode CMaps ----------------------------------------------

  /** A page font as the text interpreter needs it: code width (Type0 =
    * 2-byte CIDs) and the ToUnicode code→text mapping. Real-world PDFs
    * embed subset fonts whose string bytes are glyph ids, not characters —
    * without the CMap the extracted "text" is cipher noise. */
  final case class PdfFont(codeBytes: Int, toUnicode: Map[Int, String])

  private val BfChar = """(?s)beginbfchar(.*?)endbfchar""".r
  private val BfRange = """(?s)beginbfrange(.*?)endbfrange""".r
  private val HexTok = """<([0-9A-Fa-f]+)>""".r
  private val RangeArr = """<([0-9A-Fa-f]+)>\s*<([0-9A-Fa-f]+)>\s*\[(.*?)\]""".r
  private val RangeOne = """<([0-9A-Fa-f]+)>\s*<([0-9A-Fa-f]+)>\s*<([0-9A-Fa-f]+)>""".r

  private def hexText(h: String): String = {
    // dst hex is UTF-16BE text (possibly multi-char)
    val clean = if (h.length % 4 == 0) h else h.reverse.padTo(4 * ((h.length + 3) / 4), '0').reverse
    (0 until clean.length / 4).map { k =>
      Integer.parseInt(clean.substring(4 * k, 4 * k + 4), 16).toChar
    }.mkString
  }

  /** Parse a ToUnicode CMap stream: bfchar pairs + bfrange spans. */
  private[extract] def parseToUnicode(s: String): Map[Int, String] = {
    val out = Map.newBuilder[Int, String]
    for (m <- BfChar.findAllMatchIn(s)) {
      val toks = HexTok.findAllMatchIn(m.group(1)).map(_.group(1)).toVector
      var k = 0
      while (k + 1 < toks.length) {
        try out += (Integer.parseInt(toks(k), 16) -> hexText(toks(k + 1)))
        catch { case _: Exception => () }
        k += 2
      }
    }
    for (m <- BfRange.findAllMatchIn(s)) {
      val body = m.group(1)
      for (r <- RangeArr.findAllMatchIn(body)) {
        try {
          val lo = Integer.parseInt(r.group(1), 16)
          val dsts = HexTok.findAllMatchIn(r.group(3)).map(_.group(1)).toVector
          dsts.zipWithIndex.foreach { case (d, k) => out += (lo + k -> hexText(d)) }
        } catch { case _: Exception => () }
      }
      for (r <- RangeOne.findAllMatchIn(body)) {
        try {
          val lo = Integer.parseInt(r.group(1), 16)
          val hi = Integer.parseInt(r.group(2), 16)
          val dst = hexText(r.group(3))
          if (hi - lo < 65536 && dst.nonEmpty) {
            val base = dst.last.toInt
            val prefix = dst.dropRight(1)
            var c = lo
            while (c <= hi) {
              out += (c -> (prefix + (base + (c - lo)).toChar))
              c += 1
            }
          }
        } catch { case _: Exception => () }
      }
    }
    out.result()
  }

  /** /Resources of a page, falling back to the Pages-tree (inherited). */
  private def pageResources(doc: PdfDoc, page: PDict,
                            fallback: Option[PDict]): Option[PDict] =
    doc.dictOf(page.m.getOrElse("Resources", PNull))
      .orElse(fallback.flatMap(p => doc.dictOf(p.m.getOrElse("Resources", PNull))))

  /** Type3 detection — the reference's per-page OCR trigger
    * (`support/pdf.py:105-110`: any page font with Subtype Type3 ⇒ the
    * text layer is glyph-procedure soup, so it is DISCARDED and the page
    * goes through OCR instead). */
  private def hasType3Font(doc: PdfDoc, page: PDict,
                           fallback: Option[PDict]): Boolean =
    pageResources(doc, page, fallback)
      .flatMap(r => doc.dictOf(r.m.getOrElse("Font", PNull)))
      .exists(_.m.values.exists(fref => doc.dictOf(fref)
        .exists(_.m.get("Subtype").contains(PName("Type3")))))

  /** Embedded image XObjects of a page in name order — the reference
    * extracts these to disk and OCRs each (`support/pdf.py:111-147`). */
  private def pageImages(doc: PdfDoc, page: PDict,
                         fallback: Option[PDict]): Vector[Array[Byte]] =
    pageResources(doc, page, fallback)
      .flatMap(r => doc.dictOf(r.m.getOrElse("XObject", PNull)))
      .map(_.m.toVector.sortBy(_._1).flatMap { case (_, ref) =>
        doc.resolve(ref) match {
          case st: PStream if st.dict.m.get("Subtype").contains(PName("Image")) =>
            try Some(decodeStream(doc, st)) catch { case _: Exception => None }
          case _ => None
        }
      }).getOrElse(Vector.empty)

  /** Page font resources: /Resources (page or Pages-tree fallback) → /Font. */
  private def fontsOf(doc: PdfDoc, page: PDict, fallback: Option[PDict]): Map[String, PdfFont] = {
    val res = pageResources(doc, page, fallback)
    val fontDict = res.flatMap(r => doc.dictOf(r.m.getOrElse("Font", PNull)))
    fontDict.map(_.m.flatMap { case (fname, fref) =>
      doc.dictOf(fref).map { f =>
        val type0 = f.m.get("Subtype").contains(PName("Type0"))
        val toUni = doc.resolve(f.m.getOrElse("ToUnicode", PNull)) match {
          case st: PStream =>
            parseToUnicode(new String(decodeStream(doc, st), StandardCharsets.ISO_8859_1))
          case _ => Map.empty[Int, String]
        }
        fname -> PdfFont(if (type0) 2 else 1, toUni)
      }
    }.toMap).getOrElse(Map.empty)
  }

  // ---- content-stream text interpreter --------------------------------------

  /** Extract text from one page's content bytes: text-showing operators in
    * stream order, newline when the text cursor moves vertically; string
    * bytes decoded through the current font's ToUnicode CMap when present. */
  def pageText(content: String, fonts: Map[String, PdfFont] = Map.empty): String = {
    val lx = new Lexer(content)
    val lines = Vector.newBuilder[String]
    val cur = new StringBuilder
    val operands = mutable.ArrayBuffer.empty[PVal]
    var inText = false
    var font: PdfFont = PdfFont(1, Map.empty)
    def breakLine(): Unit = {
      if (cur.nonEmpty) { lines += cur.toString; cur.clear() }
    }
    def appendDecoded(t: String): Unit = {
      if (font.toUnicode.isEmpty) { cur.append(t); return }
      val step = font.codeBytes
      var k = 0
      while (k + step <= t.length) {
        val code =
          if (step == 2) (t.charAt(k) << 8) | (t.charAt(k + 1) & 0xff)
          else t.charAt(k) & 0xff
        font.toUnicode.get(code) match {
          case Some(u) => cur.append(u)
          case None => if (step == 1) cur.append(t.charAt(k))
        }
        k += step
      }
    }
    def showString(v: PVal): Unit = v match {
      case PStr(t) => appendDecoded(t)
      case PArr(items) => items.foreach {
        case PStr(t) => appendDecoded(t)
        case PNum(adj) => if (adj < -150) cur.append(' ') // big negative kern ≈ space
        case _ => ()
      }
      case _ => ()
    }
    while (lx.i < lx.n) {
      lx.ws()
      if (lx.i >= lx.n) ()
      else {
        val c = lx.peek
        if (c == '(' || c == '<' || c == '[' || c == '/' ||
            c == '+' || c == '-' || c == '.' || c.isDigit) {
          try operands += parseVal(lx)
          catch { case _: Exception => lx.i += 1 }
        } else {
          val start = lx.i
          while (lx.i < lx.n && !isDelim(lx.peek)) lx.i += 1
          val op = content.substring(start, lx.i)
          if (lx.i == start) lx.i += 1
          op match {
            case "BT" => inText = true
            case "ET" => inText = false; breakLine()
            case "Td" | "TD" =>
              val ty = operands.lastOption.collect { case PNum(v) => v }.getOrElse(0.0)
              if (math.abs(ty) > 0.01) breakLine()
            case "Tm" =>
              breakLine()
            case "T*" => breakLine()
            case "Tj" => if (inText) operands.lastOption.foreach(showString)
            case "'" | "\"" =>
              breakLine()
              if (inText) operands.lastOption.foreach(showString)
            case "TJ" => if (inText) operands.lastOption.foreach(showString)
            case "Tf" =>
              if (operands.length >= 2) operands(operands.length - 2) match {
                case PName(fn) => font = fonts.getOrElse(fn, PdfFont(1, Map.empty))
                case _ => ()
              }
            case _ => ()
          }
          operands.clear()
        }
      }
    }
    breakLine()
    lines.result().mkString("\n")
  }

  private def pdfDate(v: String): String = {
    // D:YYYYMMDDHHmmSS... → ISO
    val d = v.stripPrefix("D:")
    if (d.length >= 14 && d.take(14).forall(_.isDigit))
      s"${d.substring(0, 4)}-${d.substring(4, 6)}-${d.substring(6, 8)}T${d.substring(8, 10)}:${d.substring(10, 12)}:${d.substring(12, 14)}"
    else if (d.length >= 8 && d.take(8).forall(_.isDigit))
      s"${d.substring(0, 4)}-${d.substring(4, 6)}-${d.substring(6, 8)}"
    else v
  }

  private def nfkd(s: String): String =
    java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFKD)

  protected def run(docRaw: RawDoc): ExtractionResult = {
    try {
      val doc = scan(docRaw.bytes)
      if (doc.objects.isEmpty)
        throw new ProcessingError("Could not extract PDF file: no objects")
      if (doc.trailers.exists(_.m.contains("Encrypt")))
        throw new ProcessingError(ProcessingError.EncryptedMsg)
      val pages = pagesOf(doc)
      if (pages.isEmpty)
        throw new ProcessingError("Could not extract PDF file: no pages")
      val spans = Vector.newBuilder[Span]
      // Pages-tree root: fallback for inherited /Resources
      val topPages = doc.trailers.flatMap(_.m.get("Root"))
        .flatMap(doc.dictOf).headOption
        .flatMap(r => r.m.get("Pages")).flatMap(doc.dictOf)
      pages.zipWithIndex.foreach { case (pg, idx) =>
        val contents: Vector[PStream] = doc.resolve(pg.m.getOrElse("Contents", PNull)) match {
          case st: PStream => Vector(st)
          case PArr(items) => items.flatMap(i => doc.resolve(i) match {
            case st: PStream => Some(st)
            case _ => None
          })
          case _ => Vector.empty
        }
        val content = contents.map(st =>
          new String(decodeStream(doc, st), StandardCharsets.ISO_8859_1)).mkString("\n")
        // Reference `pdf_extract_page` (`support/pdf.py:101-149`): pages
        // with a Type3 font drop their text layer entirely and rely on
        // OCR; every page's embedded images are OCR'd and appended. The
        // engine is the deterministic stand-in (graft.ocr), the trigger,
        // size window and cache are the reference's contract.
        val type3 = hasType3Font(doc, pg, topPages)
        val layer = if (type3) "" else pageText(content, fontsOf(doc, pg, topPages))
        val ocrTexts = pageImages(doc, pg, topPages)
          .flatMap(img => graft.ocr.Ocr.extractOcrText(img))
        val text = nfkd(
          if (ocrTexts.isEmpty) layer
          else (layer + ocrTexts.mkString("\n")).trim)
        if (filterText(text))
          spans += Span(SpanKinds.Page, text, "", idx + 1)
        else
          spans += Span(SpanKinds.Page, "", "", idx + 1)
      }
      val props = Map.newBuilder[String, Seq[String]]
      props += ("pageCount" -> Seq(pages.size.toString))
      doc.trailers.flatMap(_.m.get("Info")).headOption
        .flatMap(doc.dictOf).foreach { info =>
          def str(k: String): Option[String] = doc.resolve(info.m.getOrElse(k, PNull)) match {
            case PStr(v) if v.trim.nonEmpty => Some(v.trim)
            case _ => None
          }
          str("Title").foreach(t => props += ("title" -> Seq(t)))
          str("Author").foreach(t => props += ("author" -> Seq(t)))
          str("Subject").foreach(t => props += ("summary" -> Seq(t)))
          str("Keywords").foreach(t => props += ("keywords" -> Seq(t)))
          str("Producer").foreach(t => props += ("generator" -> Seq(t)))
          str("CreationDate").foreach(t => props += ("authoredAt" -> Seq(pdfDate(t))))
          str("ModDate").foreach(t => props += ("modifiedAt" -> Seq(pdfDate(t))))
        }
      ExtractionResult.success(schema, spans.result(), props.result())
    } catch {
      case e: ProcessingError => throw e
      case e: Exception =>
        throw new ProcessingError(s"Could not extract PDF file: ${e.getClass.getSimpleName}")
    }
  }
}
