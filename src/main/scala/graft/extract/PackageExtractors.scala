package graft.extract

import graft.core._

import java.io.ByteArrayInputStream
import java.util.zip.{GZIPInputStream, ZipEntry, ZipInputStream}

/** Archive unpacking. The reference extracts members to a temp dir and
  * re-queues them as child documents
  * (`/root/reference/ingestors/support/package.py:13-43`,
  * `packages/zip.py:11-46`, `packages/__init__.py:39-89`,
  * `packages/tar.py`). We unpack in memory and emit ChildDoc rows that the
  * pipeline's iterative children loop re-ingests (SURVEY §3 lifecycle
  * mapping). Zip-bomb guards: member count, per-member size, total size. */
object PackageLimits {
  val MaxMembers = 10000
  val MaxMemberBytes: Long = 64L * 1024 * 1024
  val MaxTotalBytes: Long = 512L * 1024 * 1024

  /** Member-name hygiene: the reference guards path escapes by re-rooting
    * names under the temp dir (`support/temp.py:15-27`,
    * `tests/test_packages.py:15-32`). We keep only the safe relative path. */
  def safeName(raw: String): String = {
    val parts = raw.replace('\\', '/').split('/')
      .filter(p => p.nonEmpty && p != "." && p != "..")
    parts.mkString("/")
  }

  def readCapped(in: java.io.InputStream, cap: Long): Array[Byte] = {
    val buf = new java.io.ByteArrayOutputStream()
    val chunk = new Array[Byte](8192)
    var total = 0L
    var n = in.read(chunk)
    while (n >= 0 && total <= cap) {
      buf.write(chunk, 0, n)
      total += n
      n = if (total <= cap) in.read(chunk) else -1
    }
    if (total > cap) throw new ProcessingError(s"archive member exceeds $cap bytes")
    buf.toByteArray
  }
}

object ZipExtractor extends Extractor {
  val name = "ZipIngestor"
  val schema = "Package"

  protected def run(doc: RawDoc): ExtractionResult = {
    import PackageLimits._
    val children = Vector.newBuilder[ChildDoc]
    var count = 0
    var total = 0L
    val zin = new ZipInputStream(new ByteArrayInputStream(doc.bytes),
      java.nio.charset.StandardCharsets.UTF_8)
    try {
      var entry: ZipEntry = zin.getNextEntry
      if (entry == null)
        throw new ProcessingError("Invalid ZIP file: no entries")
      while (entry != null) {
        if (!entry.isDirectory) {
          count += 1
          if (count > MaxMembers)
            throw new ProcessingError("Invalid ZIP file: too many members")
          val nm = safeName(entry.getName)
          if (nm.nonEmpty) {
            val bytes = readCapped(zin, MaxMemberBytes)
            total += bytes.length
            if (total > MaxTotalBytes)
              throw new ProcessingError("Invalid ZIP file: expands too large")
            children += ChildDoc(nm, "", bytes)
          }
        }
        entry = zin.getNextEntry
      }
    } catch {
      case e: ProcessingError => throw e
      case e: Exception =>
        throw new ProcessingError(s"Invalid ZIP file: ${e.getMessage}")
    } finally zin.close()
    ExtractionResult.success(schema, children = children.result())
  }
}

/** Single-file decompressors: child name = file name minus the extension
  * (`packages/__init__.py:39-57`). */
abstract class SingleFileExtractor extends Extractor {
  val schema = "Package"
  def extensions: Seq[String]
  def decompress(bytes: Array[Byte]): Array[Byte]

  protected def run(doc: RawDoc): ExtractionResult = {
    val base0 = if (doc.fileName == null || doc.fileName.isEmpty) "extracted" else doc.fileName
    val base = extensions.map("." + _).foldLeft(base0) { (acc, ext) =>
      if (acc.endsWith(ext)) acc.dropRight(ext.length) else acc
    }
    val out =
      try decompress(doc.bytes)
      catch {
        case e: Exception => throw new ProcessingError(s"Error: ${e.getMessage}")
      }
    ExtractionResult.success(schema,
      children = Vector(ChildDoc(base, "", out)))
  }
}

object GzipExtractor extends SingleFileExtractor {
  val name = "GzipIngestor"
  val extensions = Seq("gz", "tgz")
  def decompress(bytes: Array[Byte]): Array[Byte] =
    PackageLimits.readCapped(
      new GZIPInputStream(new ByteArrayInputStream(bytes)),
      PackageLimits.MaxMemberBytes)
}

object Bz2Extractor extends SingleFileExtractor {
  val name = "BZ2Ingestor"
  val extensions = Seq("bz2", "tbz2", "tbz")
  def decompress(bytes: Array[Byte]): Array[Byte] =
    Bzip2.decompress(bytes, PackageLimits.MaxMemberBytes)
}

/** POSIX ustar tar reader — fixed 512-byte headers, octal sizes
  * (hand parse; the format is public and simple). Mirrors
  * `packages/tar.py:11-42` behavior: regular files become children. */
object TarExtractor extends Extractor {
  val name = "TarIngestor"
  val schema = "Package"

  def looksLikeTar(bytes: Array[Byte]): Boolean =
    bytes.length >= 512 &&
      (new String(bytes, 257, 5, "US-ASCII") == "ustar" || zeroChecksumOk(bytes))

  private def zeroChecksumOk(bytes: Array[Byte]): Boolean = {
    // pre-POSIX tar: validate header checksum of the first block
    try {
      val stored = parseOctal(bytes, 148, 8)
      var sum = 0L
      var i = 0
      while (i < 512) {
        sum += (if (i >= 148 && i < 156) 32 else bytes(i) & 0xff)
        i += 1
      }
      stored > 0 && stored == sum
    } catch { case _: Exception => false }
  }

  private def parseOctal(b: Array[Byte], off: Int, len: Int): Long = {
    var v = 0L
    var i = off
    val end = off + len
    while (i < end) {
      val c = b(i) & 0xff
      if (c >= '0' && c <= '7') v = v * 8 + (c - '0')
      else if (c != 0 && c != ' ') return v
      i += 1
    }
    v
  }

  private def cString(b: Array[Byte], off: Int, len: Int): String = {
    var end = off
    val max = off + len
    while (end < max && b(end) != 0) end += 1
    new String(b, off, end - off, "UTF-8")
  }

  protected def run(doc: RawDoc): ExtractionResult = {
    import PackageLimits._
    // python tarfile reads through gzip transparently, so .tar.gz routes
    // here (see Classifier.gzipContainsTar) — decompress first
    val b =
      if (graft.classify.Classifier.isGzipMagic(doc.bytes))
        readCapped(new GZIPInputStream(new ByteArrayInputStream(doc.bytes)),
          MaxTotalBytes)
      else doc.bytes
    if (b.length < 512 || b.length % 512 != 0 && b.length < 1024)
      throw new ProcessingError("Invalid tar file")
    val children = Vector.newBuilder[ChildDoc]
    var off = 0
    var count = 0
    var total = 0L
    var sawHeader = false
    while (off + 512 <= b.length) {
      if (b.slice(off, off + 512).forall(_ == 0)) {
        off = b.length // end-of-archive
      } else {
        val name0 = cString(b, off, 100)
        val prefix = if (new String(b, off + 257, 5, "US-ASCII") == "ustar")
          cString(b, off + 345, 155) else ""
        val size = parseOctal(b, off + 124, 12)
        val typeflag = b(off + 156).toChar
        if (name0.isEmpty || size < 0 || off + 512 + size > b.length)
          throw new ProcessingError("Invalid tar file: bad header")
        sawHeader = true
        if (typeflag == '0' || typeflag == 0.toChar) {
          count += 1
          total += size
          if (count > MaxMembers || size > MaxMemberBytes || total > MaxTotalBytes)
            throw new ProcessingError("tar expands too large")
          val full = safeName(if (prefix.nonEmpty) prefix + "/" + name0 else name0)
          if (full.nonEmpty)
            children += ChildDoc(full, "", b.slice(off + 512, off + 512 + size.toInt))
        }
        val blocks = ((size + 511) / 512).toInt
        off += 512 * (1 + blocks)
      }
    }
    if (!sawHeader) throw new ProcessingError("Invalid tar file")
    ExtractionResult.success(schema, children = children.result())
  }
}
