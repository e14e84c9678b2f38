package graft.classify

import graft.core.ProcessingError
import graft.extract._

/** MIME/magic-byte dispatch, replicating the reference's auction:
  * score every registered ingestor via `cls.match` (normalized MIME or
  * extension match → SCORE, plus per-class magic overrides) and take the
  * argmax; tie-break = registration order
  * (`/root/reference/ingestors/manager.py:133-152`,
  * `ingestor.py:25-39`, `setup.py:20-59`).
  *
  * Pure function — runs inside the extraction map stage with no I/O (the
  * reference shells out to libmagic; we sniff magic bytes ourselves).
  */
object Classifier {

  final case class Auction(ingestor: String, mimeType: String, score: Int)

  val Encrypted = "application/encrypted"

  // ---- magic-byte MIME sniffing (libmagic-lite) ---------------------------

  private def startsWith(b: Array[Byte], magic: Array[Int], off: Int = 0): Boolean =
    b.length >= off + magic.length &&
      magic.indices.forall(i => (b(off + i) & 0xff) == magic(i))

  private def startsWithAscii(b: Array[Byte], s: String): Boolean =
    b.length >= s.length && s.indices.forall(i => b(i) == s.charAt(i).toByte)

  def isZipMagic(b: Array[Byte]): Boolean = startsWith(b, Array(0x50, 0x4b, 0x03, 0x04))
  def isGzipMagic(b: Array[Byte]): Boolean = startsWith(b, Array(0x1f, 0x8b))
  def isOleMagic(b: Array[Byte]): Boolean =
    startsWith(b, Array(0xd0, 0xcf, 0x11, 0xe0, 0xa1, 0xb1, 0x1a, 0xe1))
  def isPdfMagic(b: Array[Byte]): Boolean = startsWithAscii(b, "%PDF-1.")

  /** What libmagic would answer for these bytes — covers the formats our
    * corpus and the reference fixtures contain. */
  def sniffMime(fileName: String, bytes: Array[Byte]): String = {
    val b = if (bytes == null) Array.empty[Byte] else bytes
    if (b.isEmpty) return "inode/x-empty"
    if (isPdfMagic(b)) return "application/pdf"
    if (graft.extract.Warc.isWarcMagic(b)) return "application/warc"
    if (isGzipMagic(b)) return "application/gzip"
    if (startsWithAscii(b, "BZh")) return "application/x-bzip2"
    if (startsWith(b, Array(0x37, 0x7a, 0xbc, 0xaf, 0x27, 0x1c)))
      return "application/x-7z-compressed"
    if (startsWithAscii(b, "Rar!")) return "application/x-rar"
    if (isZipMagic(b)) return sniffZipMime(b)
    if (isOleMagic(b)) return "application/vnd.ms-office"
    if (TarExtractor.looksLikeTar(b)) return "application/x-tar"
    if (startsWithAscii(b, "SQLite format 3\u0000")) return "application/x-sqlite3"
    if (startsWithAscii(b, "!BDN")) return "application/vnd.ms-outlook" // PST NDB
    if (startsWith(b, Array(0x89, 0x50, 0x4e, 0x47))) return "image/png"
    if (startsWith(b, Array(0xff, 0xd8, 0xff))) return "image/jpeg"
    if (startsWithAscii(b, "GIF8")) return "image/gif"
    if (startsWith(b, Array(0x49, 0x49, 0x2a, 0x00)) ||
        startsWith(b, Array(0x4d, 0x4d, 0x00, 0x2a))) return "image/tiff"
    // "BM" alone is a weak magic (plain text can start with it): require a
    // plausible DIB header size at offset 14, as libmagic effectively does
    if (startsWithAscii(b, "BM") && b.length >= 54 &&
        Set(12, 40, 108, 124).contains((b(14) & 0xff) | ((b(15) & 0xff) << 8)))
      return "image/bmp"
    if (startsWithAscii(b, "From ")) return "application/mbox"
    // text-ish sniffing on a decoded prefix
    val sample = b.take(8192)
    if (b.length >= 2 &&
        ((b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xfe ||
         (b(0) & 0xff) == 0xfe && (b(1) & 0xff) == 0xff)) return "text/plain"
    if (sample.contains(0.toByte)) return "application/octet-stream"
    val isText = Encoding.isValidUtf8(sample) || looksLatin1Text(sample)
    if (!isText) return "application/octet-stream"
    val head = new String(b.take(4096),
      java.nio.charset.StandardCharsets.ISO_8859_1).dropWhile(_.isWhitespace)
    val lower = head.take(256).toLowerCase
    if (lower.startsWith("<?xml")) {
      if (lower.contains("<svg") || lowerContains(b, "<svg")) return "image/svg+xml"
      return "text/xml"
    }
    if (lower.startsWith("<!doctype html") || lower.startsWith("<html") ||
        lower.startsWith("<head") || lower.startsWith("<body")) return "text/html"
    if (lower.startsWith("<svg")) return "image/svg+xml"
    if (lower.startsWith("{\\rtf")) return "text/rtf"
    if (lower.startsWith("begin:vcard")) return "text/vcard"
    if (lower.startsWith("begin:vcalendar")) return "text/calendar"
    if (head.startsWith("{") || head.startsWith("[")) {
      try { JsonMini.parse(new String(b, "UTF-8")); return "application/json" }
      catch { case _: Exception => () }
    }
    if (looksLikeEmailHeaders(head)) return "message/rfc822"
    if (looksLikeCsv(head)) return "text/csv"
    "text/plain"
  }

  /** libmagic-style CSV detection: several lines with a consistent nonzero
    * unquoted comma count. */
  private def looksLikeCsv(head: String): Boolean = {
    val lines = head.split("\r\n|\n").filter(_.nonEmpty).take(10)
    if (lines.length < 2) return false
    val counts = lines.map { l =>
      var inQ = false; var c = 0
      l.foreach { ch =>
        if (ch == '"') inQ = !inQ else if (ch == ',' && !inQ) c += 1
      }
      c
    }
    val mode = counts.groupBy(identity).maxBy(_._2.length)
    mode._1 > 0 && mode._2.length >= counts.length - 1
  }

  private def lowerContains(b: Array[Byte], s: String): Boolean =
    new String(b.take(2048), java.nio.charset.StandardCharsets.ISO_8859_1)
      .toLowerCase.contains(s)

  private def looksLatin1Text(b: Array[Byte]): Boolean = {
    if (b.isEmpty) return false
    var printable = 0
    var i = 0
    while (i < b.length) {
      val c = b(i) & 0xff
      if (c == 0) return false
      if (c >= 0x20 || c == '\n' || c == '\r' || c == '\t') printable += 1
      i += 1
    }
    printable.toDouble / b.length > 0.95
  }

  private val HeaderRe =
    java.util.regex.Pattern.compile("""^[A-Za-z][A-Za-z0-9\-]*:\s?.*$""")

  private def looksLikeEmailHeaders(head: String): Boolean = {
    val lines = head.split("\r\n|\n").take(10)
    val known = Set("received", "from", "to", "subject", "date", "message-id",
      "mime-version", "content-type", "return-path", "delivered-to")
    lines.count(l => HeaderRe.matcher(l).matches() &&
      known.contains(l.takeWhile(_ != ':').toLowerCase)) >= 2
  }

  /** Look inside a zip for OOXML/ODF manifests (what libmagic does for
    * docx/xlsx/odt, and `support/ooxml.py:54-69`). */
  def sniffZipMime(bytes: Array[Byte]): String = {
    zipEntryBytes(bytes, "[Content_Types].xml") match {
      case Some(m) =>
        val manifest = new String(m, "UTF-8").toLowerCase
        if (manifest.contains("wordprocessingml"))
          return "application/vnd.openxmlformats-officedocument.wordprocessingml.document"
        if (manifest.contains("spreadsheetml"))
          return "application/vnd.openxmlformats-officedocument.spreadsheetml.sheet"
        if (manifest.contains("presentationml"))
          return "application/vnd.openxmlformats-officedocument.presentationml.presentation"
      case None => ()
    }
    zipEntryBytes(bytes, "mimetype") match {
      case Some(m) =>
        val mt = new String(m, "UTF-8").trim
        if (mt.startsWith("application/vnd.oasis.opendocument")) return mt
      case None => ()
    }
    "application/zip"
  }

  /** Read one member of an in-memory zip (streaming, bounded). */
  def zipEntryBytes(bytes: Array[Byte], name: String): Option[Array[Byte]] = {
    import java.util.zip.ZipInputStream
    val zin = new ZipInputStream(new java.io.ByteArrayInputStream(bytes))
    try {
      var e = zin.getNextEntry
      var guard = 0
      while (e != null && guard < 1000) {
        if (e.getName == name)
          return Some(PackageLimits.readCapped(zin, 4L * 1024 * 1024))
        guard += 1
        e = zin.getNextEntry
      }
      None
    } catch { case _: Exception => None } finally zin.close()
  }

  def manifestMatches(bytes: Array[Byte], needle: String): Boolean =
    zipEntryBytes(bytes, "[Content_Types].xml")
      .exists(m => new String(m, "UTF-8").toLowerCase.contains(needle))

  // ---- the scoring registry (setup.py order) -------------------------------

  /** One registered ingestor's match() function. */
  private final case class Entry(name: String, score: Int,
                                 mimes: Set[String], exts: Set[String],
                                 special: (String, String, Array[Byte], Int) => Int = null) {
    def matchScore(fileName: String, mime: String, bytes: Array[Byte]): Int = {
      var s = -1
      if (mimes.contains(mime)) s = score
      else {
        val ext = extensionOf(fileName)
        if (ext.nonEmpty && exts.contains(ext)) s = score
      }
      if (special != null) s = special(fileName, mime, bytes, s)
      s
    }
  }

  def extensionOf(fileName: String): String = {
    if (fileName == null) return ""
    val base = fileName.substring(fileName.lastIndexOf('/') + 1)
    val dot = base.lastIndexOf('.')
    if (dot <= 0 || dot == base.length - 1) "" else base.substring(dot + 1).toLowerCase
  }

  private val ignoreNames = Set(".DS_Store", "Thumbs.db", ".gitignore")

  /** Is this gzip payload actually a compressed tarball? (python
    * `tarfile.is_tarfile` reads through gzip, so .tar.gz routes to
    * TarIngestor — `packages/__init__.py:55-58`, `packages/tar.py:38-42`) */
  def gzipContainsTar(bytes: Array[Byte]): Boolean = {
    if (!isGzipMagic(bytes)) return false
    try {
      val in = new java.util.zip.GZIPInputStream(
        new java.io.ByteArrayInputStream(bytes))
      val head = new Array[Byte](512)
      var off = 0
      var n = in.read(head, off, 512 - off)
      while (n > 0 && off < 512) { off += n; n = in.read(head, off, 512 - off) }
      in.close()
      off >= 512 && TarExtractor.looksLikeTar(head)
    } catch { case _: Exception => false }
  }

  private def tarMatch(f: String, m: String, b: Array[Byte], s: Int): Int =
    if (TarExtractor.looksLikeTar(b) || gzipContainsTar(b)) 4 else s

  private val registry: Vector[Entry] = Vector(
    Entry("IgnoreIngestor", 2,
      Set("application/x-pkcs7-mime", "application/pkcs7-mime",
        "application/pkcs7-signature", "application/x-pkcs7-signature",
        "application/x-pkcs12application/pgp-encrypted",
        "application/x-shockwave-flash", "application/vnd.apple.pkpass",
        "application/x-executable", "application/x-mach-binary",
        "application/x-sharedlib", "application/x-dosexec",
        "application/x-java-keystore", "application/java-archive",
        "application/font-sfnt", "application/vnd.ms-office.vbaproject",
        "application/x-x509-ca-cert", "text/calendar", "text/css",
        "application/vnd.ms-opentype", "application/x-font-ttf"),
      Set("json", "exe", "dll", "ini", "class", "jar", "psd", "indd", "sql",
        "dat", "log", "pbl", "p7m", "plist", "ics", "axd"),
      (f, m, b, s) => {
        if (b == null || b.isEmpty) 200 // zero-size ×100 (`ignore.py:55-59`)
        else if (ignoreNames.contains(
          f.substring(f.lastIndexOf('/') + 1))) 2
        else s
      }),
    Entry("HTMLIngestor", 6, Set("text/html"), Set("htm", "html", "xhtml")),
    Entry("XMLIngestor", 1, Set("text/xml"), Set("xml")),
    Entry("PlainTextIngestor", 1,
      Set("text/plain", "text/x-c", "text/x-c++", "text/x-diff",
        "text/x-python", "text/x-shellscript", "text/x-java", "text/x-php",
        "text/troff", "text/x-ruby", "text/x-pascal", "text/x-msdos-batch",
        "text/x-yaml", "text/x-makefile", "text/x-perl", "text/x-objective-c",
        "text/x-asm", "text/x-csrc", "text/x-sh", "text/javascript",
        "text/x-algol68"),
      Set("txt", "md", "rst", "nfo")),
    Entry("DocumentIngestor", 6,
      Set("text/richtext", "text/rtf", "application/rtf", "application/x-rtf",
        "application/msword", "application/vnd.ms-word",
        "application/wordperfect", "application/vnd.wordperfect",
        "application/vnd.ms-powerpoint", "application/vnd.sun.xml.impress",
        "application/vnd.ms-powerpoint.presentation",
        "application/vnd.ms-powerpoint.presentation.12",
        "application/cdfv2-unknown", "application/vnd.ms-office",
        "application/epub+zip", "application/vnd.visio", "application/x-abiword"),
      Set("602", "abw", "cdr", "cmx", "cwk", "doc", "dot", "dps", "ppt",
        "pps", "pot", "rtf", "wpd", "wps", "zabw", "pages", "key")),
    Entry("OpenDocumentIngestor", 7,
      Set("application/vnd.oasis.opendocument.text",
        "application/vnd.oasis.opendocument.text-template",
        "application/vnd.oasis.opendocument.presentation",
        "application/vnd.oasis.opendocument.graphics",
        "application/vnd.oasis.opendocument.graphics-flat-xml"),
      Set("odt", "odp", "otp")),
    Entry("OfficeOpenXMLIngestor", 7,
      Set("application/vnd.openxmlformats-officedocument.wordprocessingml.document",
        "application/vnd.openxmlformats-officedocument.wordprocessingml.template",
        "application/vnd.openxmlformats-officedocument.presentationml.slideshow",
        "application/vnd.openxmlformats-officedocument.presentationml.presentation",
        "application/vnd.openxmlformats-officedocument.presentationml.template"),
      Set("docx", "docm", "dotx", "dotm", "potx", "pptx", "ppsx", "pptm",
        "ppsm", "potm"),
      (f, m, b, s) =>
        // ×2 if the OOXML manifest confirms (`documents/ooxml.py:44-49`)
        if (s > 0 && manifestMatches(b, "wordprocessingml") ||
            s > 0 && manifestMatches(b, "presentationml")) 14 else s),
    Entry("DjVuIngestor", 3,
      Set("image/vnd.djvu", "image/x.djvu", "image/x-djvu", "image/djvu"),
      Set.empty),
    Entry("PDFIngestor", 6, Set("application/pdf"), Set("pdf"),
      (f, m, b, s) => if (s <= 0 && isPdfMagic(b)) 12 else s),
    Entry("RARIngestor", 4, Set("application/rarapplication/x-rar"), Set("rar"),
      (f, m, b, s) => if (startsWithAscii(b, "Rar!")) 4 else s),
    Entry("ZipIngestor", 3,
      Set("application/zip", "application/x-zip", "multipart/x-zip",
        "application/zip-compressed", "application/x-zip-compressed"),
      Set("zip"),
      (f, m, b, s) => if (isZipMagic(b)) 3 else s),
    Entry("TarIngestor", 4,
      Set("application/tar", "application/x-tar", "application/x-tgz",
        "application/x-gtar"),
      Set("tar"), tarMatch),
    Entry("SevenZipIngestor", 4,
      Set("application/x-7z-compressed", "application/7z-compressed"),
      Set("7z", "7zip")),
    // Beyond the reference's 37 (ingest-file has no WARC ingestor): the
    // Common Crawl container. Magic "WARC/" wins outright; the compound
    // `.warc.gz` extension must outbid GzipIngestor's `gz` match so the
    // member-per-record stream is read in one hop.
    Entry("WARCIngestor", 9,
      Set("application/warc", "application/x-warc"), Set("warc"),
      (f, m, b, s) =>
        if (graft.extract.Warc.isWarcMagic(b) ||
            (f != null && f.toLowerCase.endsWith(".warc.gz"))) 15 else s),
    Entry("GzipIngestor", 2,
      Set("application/gzip", "application/x-gzip", "multipart/x-gzip"),
      Set("gz", "tgz"),
      (f, m, b, s) => if (gzipContainsTar(b) || TarExtractor.looksLikeTar(b)) -1 else s),
    Entry("BZ2Ingestor", 2,
      Set("application/x-bzip", "application/x-bzip2", "multipart/x-bzip",
        "multipart/x-bzip2"),
      Set("bz", "tbz", "bz2", "tbz2")),
    Entry("OutlookPSTIngestor", 5, Set("application/vnd.ms-outlook"),
      Set("pst", "ost", "pab")),
    Entry("OutlookOLMArchiveIngestor", 10, Set.empty, Set("olm")),
    Entry("OutlookOLMMessageIngestor", 15,
      Set("application/xml+opfmessage"), Set.empty),
    Entry("OutlookMsgIngestor", 10,
      Set("application/msg", "application/x-msg", "application/vnd.ms-outlook",
        "msg/rfc822"),
      Set("msg"),
      (f, m, b, s) => if (s > 0 && !isOleMagic(b)) -1 else s),
    Entry("RFC822Ingestor", 7, Set("multipart/mixed", "message/rfc822"),
      Set("eml", "rfc822", "email", "msg")),
    Entry("AppleEmlxIngestor", 8, Set.empty, Set("emlx")),
    Entry("VCardIngestor", 10, Set("text/vcard", "text/x-vcard"),
      Set("vcf", "vcard")),
    Entry("CalendarIngestor", 10, Set("text/calendar"),
      Set("ics", "ical", "icalendar", "ifb")),
    Entry("CSVIngestor", 7, Set("text/csv", "text/tsv", "text/tab-separated-values"),
      Set("csv", "tsv")),
    Entry("AccessIngestor", 8,
      Set("application/msaccess", "application/x-msaccess",
        "application/vnd.msaccess", "application/vnd.ms-access",
        "application/mdb", "application/x-mdb"),
      Set("mdb")),
    Entry("SQLiteIngestor", 8,
      Set("application/x-sqlite3", "application/x-sqlite",
        "application/sqlite3", "application/sqlite"),
      Set("sqlite3", "sqlite", "db"),
      (f, m, b, s) =>
        if (s > 0 && !startsWithAscii(b, "SQLite format 3\u0000")) -1 else s),
    Entry("ExcelIngestor", 7,
      Set("application/excel", "application/x-excel",
        "application/vnd.ms-excel", "application/x-msexcel"),
      Set("xls", "xlt", "xla")),
    Entry("ExcelXMLIngestor", 7,
      Set("application/vnd.openxmlformats-officedocument.spreadsheetml.sheet",
        "application/vnd.openxmlformats-officedocument.spreadsheetml.template",
        "application/vnd.ms-excel.sheet.macroenabled.12",
        "application/vnd.ms-excel.sheet.binary.macroenabled.12"),
      Set("xlsx", "xlsm", "xltx", "xltm"),
      (f, m, b, s) => if (s > 0 && !manifestMatches(b, "spreadsheetml")) -1 else s),
    Entry("OpenOfficeSpreadsheetIngestor", 7,
      Set("application/vnd.oasis.opendocument.spreadsheet",
        "application/vnd.oasis.opendocument.spreadsheet-template"),
      Set("ods", "ots")),
    Entry("MboxFileIngestor", 6, Set("application/mbox"), Set("mbox"),
      (f, m, b, s) => if (s < 0 && MboxExtractor.looksLikeMbox(b)) 6 else s),
    Entry("DBFIngestor", 8,
      Set("application/dbase", "application/x-dbase", "application/dbf",
        "application/x-dbf"),
      Set("dbf")),
    Entry("ImageIngestor", 10,
      Set("image/x-portable-graymap", "image/png", "image/x-png",
        "image/jpeg", "image/jpg", "image/gif", "image/pjpeg", "image/bmp",
        "image/x-windows-bmp", "image/x-portable-bitmap", "image/x-coreldraw"),
      Set("jpg", "jpe", "jpeg", "png", "gif", "bmp"),
      (f, m, b, s) => if (s <= 0 && m.startsWith("image/")) 9 else s),
    Entry("TIFFIngestor", 11, Set("image/tiff", "image/x-tiff"),
      Set("tif", "tiff")),
    Entry("SVGIngestor", 20, Set("image/svg+xml"), Set("svg")),
    Entry("AudioIngestor", 3,
      Set("audio/mpeg", "audio/mp3", "audio/x-m4a", "audio/x-hx-aac-adts",
        "audio/x-wav", "audio/mp4", "audio/ogg", "audio/vnd.wav",
        "audio/flac", "audio/x-ms-wma", "audio/webm"),
      Set("wav", "mp3", "aac", "ac3", "m4a", "m4b", "ogg", "opus", "flac", "wma"),
      (f, m, b, s) => if (s <= 0 && m.startsWith("audio/")) 6 else s),
    Entry("VideoIngestor", 3,
      Set("application/x-shockwave-flash", "video/quicktime", "video/mp4",
        "video/x-flv"),
      Set("avi", "mpg", "mpeg", "mkv", "mp4", "mov"),
      (f, m, b, s) => if (s <= 0 && m.startsWith("video/")) 6 else s),
    Entry("JSONIngestor", 3, Set("application/json", "text/javascript"),
      Set("json"))
  )

  /** Full auction: sniff MIME if absent, reject encrypted, argmax scores.
    * Returns Left(error) when no ingestor matches (reference raises
    * ProcessingException "Format not supported", `manager.py:149-151`). */
  def auction(fileName: String, mimeHint: String, bytes: Array[Byte]): Either[String, Auction] = {
    val mime =
      if (mimeHint != null && mimeHint.nonEmpty) mimeHint.trim.toLowerCase
      else sniffMime(fileName, bytes)
    if (mime == Encrypted) return Left(ProcessingError.EncryptedMsg)
    var bestScore = 0
    var bestName: String = null
    for (e <- registry) {
      val s = e.matchScore(fileName, mime, bytes)
      if (s > bestScore) { bestScore = s; bestName = e.name }
    }
    if (bestName == null) Left("Format not supported")
    else Right(Auction(bestName, mime, bestScore))
  }
}
