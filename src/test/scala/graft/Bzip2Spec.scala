package graft

import graft.core.{ExtractionResult, ProcessingError}
import graft.extract.{Bz2Extractor, Bzip2, RawDoc}
import org.scalatest.funsuite.AnyFunSuite

class Bzip2Spec extends AnyFunSuite {

  /** bz2.compress(b"Hello bzip2 world! "*7 + ... , 9) — made with CPython's
    * public bz2 module, embedded as a cross-implementation golden. */
  private val pythonBz2 = java.util.Base64.getDecoder.decode(
    "QlpoOTFBWSZTWQFNPTYAABx9gAAQCABgAH/gAEA2JNCQIABIr9UE0zSYmIaYZ/qowJgJoxPSb" +
    "a8aWo+BAhgOUyHT50r3a6KL2FsDIeBgPw0C+AQEDIPByBz1sXckU4UJABTT02A=")
  private val pythonPlain =
    ("Hello bzip2 world! " * 7 + "\n" + "aaaaaaaaaaaaaaaaaaaaaaa zzz 0123456789\n")
      .getBytes("UTF-8")

  test("decoder handles a CPython-produced stream") {
    assert(Bzip2.decompress(pythonBz2).sameElements(pythonPlain))
  }

  test("self roundtrip across shapes") {
    val rng = new graft.corpus.CorpusGen.Rng(99)
    val cases = Seq(
      Array.empty[Byte],
      "a".getBytes,
      "hello world".getBytes,
      ("x" * 1000).getBytes, // long run → RLE1 path
      ("ab" * 700 + "the quick brown fox " * 40).getBytes,
      Array.fill(4096)((rng.nextInt(256) - 128).toByte), // incompressible
      Array.fill(60000)((rng.nextInt(8) + 'a').toByte)) // larger block
    for ((c, i) <- cases.zipWithIndex) {
      val enc = Bzip2.compress(c)
      val dec = Bzip2.decompress(enc)
      assert(dec.sameElements(c), s"case $i: ${dec.length} vs ${c.length}")
    }
  }

  test("corrupt streams fail cleanly") {
    intercept[ProcessingError](Bzip2.decompress("not bz2".getBytes))
    val enc = Bzip2.compress("some reasonable content here".getBytes)
    val bad = enc.clone()
    bad(bad.length / 2) = (bad(bad.length / 2) ^ 0x55).toByte
    intercept[ProcessingError](Bzip2.decompress(bad))
  }

  test("output cap enforced") {
    val enc = Bzip2.compress(("y" * 100000).getBytes)
    intercept[ProcessingError](Bzip2.decompress(enc, cap = 1000))
  }

  test("BZ2Ingestor: child named minus extension (packages/__init__.py:39-57)") {
    val enc = Bzip2.compress("inner text".getBytes)
    val r = Bz2Extractor.extract(RawDoc("d", "note.txt.bz2",
      "application/x-bzip2", enc))
    assert(r.status == ExtractionResult.Success, r.error)
    assert(r.children.length == 1)
    assert(r.children.head.file_name == "note.txt")
    assert(new String(r.children.head.bytes, "UTF-8") == "inner text")
  }
}
