package graft.extract

import java.nio.charset.{Charset, CharsetDecoder, CodingErrorAction, StandardCharsets}
import java.nio.ByteBuffer

import graft.core.ProcessingError

/** Charset detection + decoding, mirroring the reference's EncodingSupport
  * (`/root/reference/ingestors/support/encoding.py:12-62`, which wraps
  * chardet/normality). From-scratch heuristic: BOM, strict UTF-8
  * validation, UTF-16 zero-byte pattern, single-byte fallback. We match the
  * reference on the fixture corpus, not on chardet's entire behavior
  * (SURVEY §7 hard-part (c)). */
object Encoding {

  val Default = "utf-8"

  /** Guess the charset name for a byte payload. */
  def guessEncoding(bytes: Array[Byte]): String = {
    if (bytes == null || bytes.isEmpty) return Default
    // BOMs
    if (bytes.length >= 3 && (bytes(0) & 0xff) == 0xef &&
        (bytes(1) & 0xff) == 0xbb && (bytes(2) & 0xff) == 0xbf) return "utf-8"
    if (bytes.length >= 2 && (bytes(0) & 0xff) == 0xff && (bytes(1) & 0xff) == 0xfe)
      return "utf-16le"
    if (bytes.length >= 2 && (bytes(0) & 0xff) == 0xfe && (bytes(1) & 0xff) == 0xff)
      return "utf-16be"
    // UTF-16 without BOM: lots of NULs in alternating positions
    val sample = bytes.take(8192)
    val nulEven = sample.indices.count(i => i % 2 == 0 && sample(i) == 0)
    val nulOdd = sample.indices.count(i => i % 2 == 1 && sample(i) == 0)
    val half = sample.length / 2.0
    if (half > 4 && nulOdd > half * 0.4 && nulEven < half * 0.05) return "utf-16le"
    if (half > 4 && nulEven > half * 0.4 && nulOdd < half * 0.05) return "utf-16be"
    if (isValidUtf8(sample)) return "utf-8"
    // single-byte fallback: windows-1252 covers latin1 + smart punctuation
    "windows-1252"
  }

  def isValidUtf8(bytes: Array[Byte]): Boolean = {
    var i = 0
    val n = bytes.length
    while (i < n) {
      val b = bytes(i) & 0xff
      val len =
        if (b < 0x80) 1
        else if ((b & 0xe0) == 0xc0) 2
        else if ((b & 0xf0) == 0xe0) 3
        else if ((b & 0xf8) == 0xf0) 4
        else return false
      if (len > 1) {
        if (i + len > n) return true // truncated multi-byte at sample end: tolerate
        var j = 1
        while (j < len) {
          if ((bytes(i + j) & 0xc0) != 0x80) return false
          j += 1
        }
        if (len == 2 && b < 0xc2) return false // overlong
      }
      i += len
    }
    true
  }

  private def charsetFor(name: String): Charset = name.toLowerCase match {
    case "utf-8" | "utf8" | "ascii" | "us-ascii" => StandardCharsets.UTF_8
    case "utf-16le" => StandardCharsets.UTF_16LE
    case "utf-16be" => StandardCharsets.UTF_16BE
    case "utf-16" => StandardCharsets.UTF_16
    case "latin-1" | "latin1" | "iso-8859-1" | "iso8859-1" => StandardCharsets.ISO_8859_1
    case other =>
      try Charset.forName(other)
      catch { case _: Exception => StandardCharsets.UTF_8 }
  }

  /** Strict decode with the given charset; throws on malformed input. */
  def decodeStrict(bytes: Array[Byte], charset: String): String = {
    val cs = charsetFor(charset)
    val dec: CharsetDecoder = cs.newDecoder()
      .onMalformedInput(CodingErrorAction.REPORT)
      .onUnmappableCharacter(CodingErrorAction.REPORT)
    val out = dec.decode(ByteBuffer.wrap(stripBom(bytes, cs))).toString
    out
  }

  private def stripBom(bytes: Array[Byte], cs: Charset): Array[Byte] = {
    if (cs == StandardCharsets.UTF_8 && bytes.length >= 3 &&
        (bytes(0) & 0xff) == 0xef && (bytes(1) & 0xff) == 0xbb &&
        (bytes(2) & 0xff) == 0xbf) bytes.drop(3)
    else if ((cs == StandardCharsets.UTF_16LE || cs == StandardCharsets.UTF_16BE) &&
             bytes.length >= 2 &&
             ((bytes(0) & 0xff) == 0xff && (bytes(1) & 0xff) == 0xfe ||
              (bytes(0) & 0xff) == 0xfe && (bytes(1) & 0xff) == 0xff)) bytes.drop(2)
    else bytes
  }

  /** The reference's `read_file_decoded` contract
    * (`support/encoding.py:46-62`): guess, then strict-decode; a decode
    * error under the guessed charset is a ProcessingException. */
  def readDecoded(bytes: Array[Byte]): String = {
    val enc = guessEncoding(bytes)
    try decodeStrict(bytes, enc)
    catch {
      case e: Exception =>
        throw new ProcessingError(s"Error decoding file as $enc: ${e.getMessage}")
    }
  }

  /** Lenient decode (replacement chars), for contexts where the reference
    * uses errors="replace" (`tabular/csv.py:29`). */
  def decodeReplace(bytes: Array[Byte], charset: String): String =
    new String(stripBom(bytes, charsetFor(charset)), charsetFor(charset))
}
