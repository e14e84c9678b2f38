package graft.extract

import java.nio.charset.StandardCharsets
import java.util.Base64

/** From-scratch RFC 822/2045/2047 MIME parsing: header unfolding, encoded
  * words, multipart boundary splitting, base64 / quoted-printable transfer
  * decoding. Replaces the Python `email` package the reference leans on in
  * `/root/reference/ingestors/email/msg.py`. */
object Mime {

  /** Hand-rolled "\r\n|\n" splitter with limit=-1 semantics: splits at
    * every LF, strips one preceding CR, keeps lone CRs in the line and
    * trailing empty segments — the regex alternation scanned per position
    * and dominated the EML profile. */
  private def splitLines(s: String): Array[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var start = 0
    var i = s.indexOf('\n')
    while (i >= 0) {
      val end = if (i > start && s.charAt(i - 1) == '\r') i - 1 else i
      out += s.substring(start, end)
      start = i + 1
      i = s.indexOf('\n', start)
    }
    out += s.substring(start)
    out.toArray
  }

  final case class Part(headers: Vector[(String, String)],
                        bodyBytes: Array[Byte],
                        subParts: Vector[Part]) {

    // lazy lowercase index: header lookups happen ~15x per message and
    // the collect-with-equalsIgnoreCase scan was a measured hot spot
    private lazy val headerMap: Map[String, Vector[String]] =
      headers.groupMap(_._1.toLowerCase)(_._2)

    def getAll(name: String): Seq[String] =
      headerMap.getOrElse(name.toLowerCase, Vector.empty)

    def get(name: String): Option[String] = getAll(name).headOption

    lazy val contentType: (String, Map[String, String]) =
      parseContentType(get("Content-Type").getOrElse("text/plain"))

    def mimeType: String = contentType._1
    def param(name: String): Option[String] = contentType._2.get(name)
    def isMultipart: Boolean = mimeType.startsWith("multipart/")

    def fileName: Option[String] = {
      val cd = get("Content-Disposition").map(parseContentType)
      cd.flatMap(_._2.get("filename"))
        .orElse(param("name"))
        .map(decodeWords)
        .filter(_.nonEmpty)
    }

    def isAttachment: Boolean =
      get("Content-Disposition").exists(_.trim.toLowerCase.startsWith("attachment"))

    /** Transfer-decoded payload bytes. */
    def decodedBytes: Array[Byte] = {
      val cte = get("Content-Transfer-Encoding").map(_.trim.toLowerCase).getOrElse("")
      cte match {
        case "base64" =>
          try Base64.getMimeDecoder.decode(new String(bodyBytes, StandardCharsets.US_ASCII)
            .filterNot(_.isWhitespace))
          catch { case _: Exception => bodyBytes }
        case "quoted-printable" => decodeQP(bodyBytes)
        case _ => bodyBytes
      }
    }

    /** Decoded payload as text per the part charset. */
    def decodedText: String = {
      val cs = param("charset").getOrElse("")
      val b = decodedBytes
      if (cs.nonEmpty) {
        try Encoding.decodeStrict(b, cs)
        catch { case _: Exception => Encoding.readDecoded(b) }
      } else Encoding.readDecoded(b)
    }
  }

  /** Parse a full message (or message part) from raw bytes. */
  def parse(bytes: Array[Byte]): Part = {
    // ISO-8859-1 is a 1:1 byte<->char mapping; structure scan is byte-safe
    val raw = new String(bytes, StandardCharsets.ISO_8859_1)
    parseString(raw)
  }

  /** Multipart nesting bound — real mail is < 10 deep; a crafted payload
    * with thousands of nested multiparts otherwise recurses past the task
    * stack. */
  private val MaxMultipartDepth = 50

  private def parseString(raw: String, depth: Int = 0): Part = {
    val (headerBlock, body) = splitHeadersBody(raw)
    val headers = unfoldHeaders(headerBlock)
    val part = Part(headers, body.getBytes(StandardCharsets.ISO_8859_1), Vector.empty)
    if (part.isMultipart && depth < MaxMultipartDepth) {
      part.param("boundary") match {
        case Some(b) if b.nonEmpty =>
          val subs = splitMultipartRaw(body, b).map(parseString(_, depth + 1))
          part.copy(subParts = subs)
        case _ => part
      }
    } else part
  }

  private def splitHeadersBody(raw: String): (String, String) = {
    val idxRn = raw.indexOf("\r\n\r\n")
    val idxN = raw.indexOf("\n\n")
    if (idxRn >= 0 && (idxN < 0 || idxRn + 1 <= idxN))
      (raw.substring(0, idxRn), raw.substring(idxRn + 4))
    else if (idxN >= 0) (raw.substring(0, idxN), raw.substring(idxN + 2))
    else (raw, "")
  }

  private def unfoldHeaders(block: String): Vector[(String, String)] = {
    val out = Vector.newBuilder[(String, String)]
    var curKey: String = null
    val curVal = new StringBuilder
    def flush(): Unit = if (curKey != null) {
      out += (curKey -> curVal.toString.trim)
      curKey = null; curVal.clear()
    }
    for (line <- splitLines(block)) {
      if (line.nonEmpty && (line.charAt(0) == ' ' || line.charAt(0) == '\t')) {
        if (curKey != null) curVal.append(' ').append(line.trim)
      } else {
        flush()
        val colon = line.indexOf(':')
        if (colon > 0) {
          curKey = line.substring(0, colon).trim
          curVal.append(line.substring(colon + 1).trim)
        }
      }
    }
    flush()
    out.result()
  }

  def splitMultipartRaw(body: String, boundary: String): Vector[String] = {
    val delim = "--" + boundary
    val lines = splitLines(body)
    val parts = Vector.newBuilder[String]
    val cur = new StringBuilder
    var inPart = false
    var closed = false
    for (line <- lines if !closed) {
      if (line == delim || line == delim + "--" ||
          line.startsWith(delim) && line.drop(delim.length).forall(c => c == '-' || c.isWhitespace)) {
        if (inPart) parts += cur.toString.stripSuffix("\n")
        cur.clear()
        inPart = true
        if (line.startsWith(delim + "--")) closed = true
      } else if (inPart) {
        cur.append(line).append('\n')
      }
    }
    if (inPart && !closed && cur.nonEmpty) parts += cur.toString.stripSuffix("\n")
    parts.result()
  }

  def decodeQP(bytes: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(bytes.length)
    var i = 0
    val n = bytes.length
    while (i < n) {
      val c = bytes(i)
      if (c == '=' && i + 1 < n) {
        if (bytes(i + 1) == '\n') i += 2 // soft break
        else if (bytes(i + 1) == '\r' && i + 2 < n && bytes(i + 2) == '\n') i += 3
        else if (i + 2 < n && isHex(bytes(i + 1)) && isHex(bytes(i + 2))) {
          out.write(Integer.parseInt(
            new String(Array(bytes(i + 1), bytes(i + 2)), StandardCharsets.US_ASCII), 16))
          i += 3
        } else { out.write(c); i += 1 }
      } else { out.write(c); i += 1 }
    }
    out.toByteArray
  }

  private def isHex(b: Byte): Boolean = {
    val c = b.toChar
    (c >= '0' && c <= '9') || (c >= 'A' && c <= 'F') || (c >= 'a' && c <= 'f')
  }

  private val EncodedWord = """=\?([^?]+)\?([bBqQ])\?([^?]*)\?=""".r
  // precompiled per-header patterns (String.replaceAll recompiles per call)
  private val AdjacentWords =
    java.util.regex.Pattern.compile("(\\?=)\\s+(=\\?)")
  private val DateWs = java.util.regex.Pattern.compile("\\s+")
  private val DateComment = java.util.regex.Pattern.compile("\\(.*\\)$")

  /** RFC 2047 encoded-word decoding for header values. */
  def decodeWords(value: String): String = {
    if (!value.contains("=?")) return value
    // adjacent encoded words are joined without intervening whitespace
    val collapsed = AdjacentWords.matcher(value).replaceAll("$1$2")
    EncodedWord.replaceAllIn(collapsed, m => {
      val charset = m.group(1)
      val enc = m.group(2).toLowerCase
      val payload = m.group(3)
      val bytes =
        if (enc == "b") {
          try Base64.getMimeDecoder.decode(payload)
          catch { case _: Exception => payload.getBytes(StandardCharsets.US_ASCII) }
        } else decodeQP(payload.replace('_', ' ').getBytes(StandardCharsets.US_ASCII))
      val s = try Encoding.decodeStrict(bytes, charset)
              catch { case _: Exception => new String(bytes, StandardCharsets.UTF_8) }
      java.util.regex.Matcher.quoteReplacement(s)
    })
  }

  def parseContentType(value: String): (String, Map[String, String]) = {
    val parts = splitParams(value)
    val main = parts.headOption.getOrElse("").trim.toLowerCase
    val params = parts.drop(1).flatMap { p =>
      val eq = p.indexOf('=')
      if (eq <= 0) None
      else {
        val k = p.substring(0, eq).trim.toLowerCase
        var v = p.substring(eq + 1).trim
        if (v.length >= 2 && v.startsWith("\"") && v.endsWith("\""))
          v = v.substring(1, v.length - 1)
        Some(k -> v)
      }
    }.toMap
    (main, params)
  }

  private def splitParams(value: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    val cur = new StringBuilder
    var inQ = false
    for (c <- value) {
      if (c == '"') { inQ = !inQ; cur.append(c) }
      else if (c == ';' && !inQ) { out += cur.toString; cur.clear() }
      else cur.append(c)
    }
    out += cur.toString
    out.result()
  }

  // ---- address parsing (email.utils.getaddresses analogue) ---------------

  final case class Address(name: String, email: String)

  private val EmailRe =
    """(?i)^[A-Z0-9._%+\-]+@[A-Z0-9.\-]+\.[A-Z]{2,}$""".r

  def validEmail(s: String): Boolean =
    s != null && s.nonEmpty && EmailRe.findFirstIn(s).isDefined

  /** Split an address header on top-level commas and parse each mailbox. */
  def parseAddresses(value: String): Vector[Address] = {
    if (value == null || value.trim.isEmpty) return Vector.empty
    val decoded = decodeWords(value)
    val items = Vector.newBuilder[String]
    val cur = new StringBuilder
    var inQ = false
    var depth = 0
    for (c <- decoded) {
      if (c == '"') { inQ = !inQ; cur.append(c) }
      else if (!inQ && c == '<') { depth += 1; cur.append(c) }
      else if (!inQ && c == '>') { depth = math.max(0, depth - 1); cur.append(c) }
      else if (!inQ && depth == 0 && c == ',') { items += cur.toString; cur.clear() }
      else cur.append(c)
    }
    items += cur.toString
    items.result().map(_.trim).filter(_.nonEmpty).flatMap(parseMailbox)
  }

  private def parseMailbox(s: String): Option[Address] = {
    val lt = s.lastIndexOf('<')
    val gt = s.lastIndexOf('>')
    if (lt >= 0 && gt > lt) {
      val addr = s.substring(lt + 1, gt).trim
      var name = s.substring(0, lt).trim
      if (name.length >= 2 && name.startsWith("\"") && name.endsWith("\""))
        name = name.substring(1, name.length - 1)
      Some(Address(name.trim, addr))
    } else {
      // bare address, possibly with (comment) name
      val comment = """\(([^)]*)\)""".r
      val name = comment.findFirstMatchIn(s).map(_.group(1).trim).getOrElse("")
      val addr = comment.replaceAllIn(s, "").trim
      if (addr.isEmpty) None else Some(Address(name, addr))
    }
  }

  // ---- date parsing (email.utils.parsedate_to_datetime analogue) ---------

  import java.time.format.DateTimeFormatter
  import java.time.{OffsetDateTime, LocalDateTime, ZoneOffset}

  private val rfc2822Formats = Seq(
    DateTimeFormatter.ofPattern("[EEE, ]d MMM yyyy HH:mm:ss Z", java.util.Locale.US),
    DateTimeFormatter.ofPattern("[EEE, ]d MMM yyyy HH:mm:ss z", java.util.Locale.US),
    DateTimeFormatter.ofPattern("[EEE, ]d MMM yyyy HH:mm Z", java.util.Locale.US))

  /** Parse an RFC 2822 date header; returns ISO-8601 local form, the shape
    * FtM stores (`support/email.py:94-101`). */
  def parseDate(value: String): Option[String] = {
    val v = DateComment.matcher(
      DateWs.matcher(value.trim).replaceAll(" ")).replaceAll("").trim
      .replace("GMT", "+0000").replace("UT", "+0000")
    for (f <- rfc2822Formats) {
      try {
        val odt = OffsetDateTime.parse(v, f)
        return Some(odt.toLocalDateTime.format(
          DateTimeFormatter.ofPattern("yyyy-MM-dd'T'HH:mm:ss")))
      } catch { case _: Exception => () }
    }
    try {
      val ldt = LocalDateTime.parse(v, DateTimeFormatter.ISO_LOCAL_DATE_TIME)
      Some(ldt.format(DateTimeFormatter.ofPattern("yyyy-MM-dd'T'HH:mm:ss")))
    } catch { case _: Exception => None }
  }
}
