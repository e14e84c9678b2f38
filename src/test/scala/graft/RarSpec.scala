package graft

import graft.core.ExtractionResult
import graft.corpus.CorpusGen
import graft.extract.{Rar, RarExtractor, RawDoc}
import org.scalatest.funsuite.AnyFunSuite

import java.nio.charset.StandardCharsets.UTF_8

/** From-scratch RAR reader: RAR4 writer↔reader roundtrip, contract errors,
  * and robustness. RAR5 coverage runs against the reference's own
  * badrar.rar fixture in FixtureSpec. */
class RarSpec extends AnyFunSuite {

  private def doc(b: Array[Byte]) = RawDoc("d", "test.rar", "", b)

  test("RAR4 store roundtrip: members come back byte-identical") {
    val members = Seq(
      "a.txt" -> "hello rar world".getBytes(UTF_8),
      "dir/b.bin" -> Array.tabulate(4096)(i => (i * 31).toByte),
      "unicode-ñäme.txt" -> "ü".getBytes(UTF_8))
    val bytes = CorpusGen.renderRar(members)
    val arch = Rar.parse(bytes)
    assert(arch.version == 4 && !arch.volume && !arch.encryptedHeaders)
    assert(arch.members.map(_.name) == members.map(_._1).toVector)
    assert(arch.members.forall(_.method == 0x30))
    val r = RarExtractor.extract(doc(bytes))
    assert(r.status == ExtractionResult.Success, r.error)
    assert(r.children.map(_.file_name) == members.map(_._1).toVector)
    for ((c, (_, b)) <- r.children.zip(members))
      assert(java.util.Arrays.equals(c.bytes, b))
  }

  test("compressed member: listed, skipped with a failure child (rar.py:28-30 warn-and-skip)") {
    val rar = CorpusGen.renderRar(Seq(
      "keep.txt" -> "stored body".getBytes(UTF_8),
      "packed.dat" -> Array.tabulate(48)(_.toByte)),
      compressedNames = Set("packed.dat"))
    val arch = Rar.parse(rar)
    assert(arch.members.map(_.name) == Vector("keep.txt", "packed.dat"))
    val packed = arch.members.find(_.name == "packed.dat").get
    assert(packed.method != 0x30 && packed.data.isEmpty)
    val res = RarExtractor.extract(RawDoc("r", "x.rar", "application/x-rar", rar))
    assert(res.status == ExtractionResult.Success)
    val byName = res.children.map(c => c.file_name -> c).toMap
    assert(new String(byName("keep.txt").bytes, UTF_8) == "stored body")
    assert(byName("packed.dat").mime_hint == Rar.UnsupportedMemberMime)
    assert(byName("packed.dat").bytes.isEmpty)
    // dispatch turns the planted hint into the reference's failure text
    val ing = graft.pipeline.Dispatch.ingest("packed.dat",
      Rar.UnsupportedMemberMime, Array.emptyByteArray)
    assert(ing.ingestor == "RARIngestor")
    assert(ing.result.status == ExtractionResult.Failure)
    assert(ing.result.error.contains("Failed to unpack [packed.dat]"))
  }

  test("RAR4 header CRCs in the writer satisfy the reader's check") {
    // flip one header byte → the CRC check must reject the archive
    val bytes = CorpusGen.renderRar(Seq("x.txt" -> "data".getBytes(UTF_8)))
    val broken = bytes.clone()
    broken(7 + 13 + 4) = (broken(7 + 13 + 4) ^ 0x01).toByte // file hdr size lsb
    val r = RarExtractor.extract(doc(broken))
    assert(r.status == ExtractionResult.Failure)
    assert(r.error.startsWith("Invalid RAR file"), r.error)
  }

  test("multi-volume continuation reproduces 'Cannot load RAR partials' (packages/rar.py:33-34)") {
    // main header with MHD_VOLUME set and MHD_FIRSTVOLUME clear
    val bos = new java.io.ByteArrayOutputStream()
    bos.write(Array[Byte]('R', 'a', 'r', '!', 0x1a, 0x07, 0x00))
    val mh = Array[Byte](0x73, 0x01, 0x00, 0x0d, 0x00, 0, 0, 0, 0, 0, 0)
    val c = new java.util.zip.CRC32; c.update(mh)
    val crc = (c.getValue & 0xffff).toInt
    bos.write(crc & 0xff); bos.write((crc >> 8) & 0xff); bos.write(mh)
    val r = RarExtractor.extract(doc(bos.toByteArray))
    assert(r.status == ExtractionResult.Failure)
    assert(r.error == "Cannot load RAR partials", r.error)
  }

  test("encrypted headers reproduce the password contract") {
    val bos = new java.io.ByteArrayOutputStream()
    bos.write(Array[Byte]('R', 'a', 'r', '!', 0x1a, 0x07, 0x00))
    val mh = Array[Byte](0x73, 0x80.toByte, 0x00, 0x0d, 0x00, 0, 0, 0, 0, 0, 0)
    val c = new java.util.zip.CRC32; c.update(mh)
    val crc = (c.getValue & 0xffff).toInt
    bos.write(crc & 0xff); bos.write((crc >> 8) & 0xff); bos.write(mh)
    val r = RarExtractor.extract(doc(bos.toByteArray))
    assert(r.status == ExtractionResult.Failure)
    assert(r.error.toLowerCase.contains("password"), r.error)
  }

  test("garbage and truncated input fail as values, never throw") {
    for (b <- Seq(Array.empty[Byte], "Rar!".getBytes(UTF_8),
        Array[Byte]('R', 'a', 'r', '!', 0x1a, 0x07, 0x00, 0x74),
        CorpusGen.renderRar(Seq("x" -> "y".getBytes(UTF_8))).take(30),
        Array.fill(64)(0x41.toByte))) {
      val r = RarExtractor.extract(doc(b))
      assert(r.status == ExtractionResult.Failure)
    }
  }

  test("member-name path escapes stay contained") {
    val bytes = CorpusGen.renderRar(Seq(
      "../../etc/passwd" -> "nope".getBytes(UTF_8),
      "/abs/path.txt" -> "abs".getBytes(UTF_8)))
    val r = RarExtractor.extract(doc(bytes))
    assert(r.status == ExtractionResult.Success, r.error)
    assert(r.children.forall(ch => !ch.file_name.startsWith("/") &&
      !ch.file_name.contains("..")), r.children.map(_.file_name))
  }
}
