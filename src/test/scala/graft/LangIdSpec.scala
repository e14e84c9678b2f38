package graft

import graft.ops.{LangId, TextOps}
import org.scalatest.funsuite.AnyFunSuite

class LangIdSpec extends AnyFunSuite {

  test("every held-out test sentence classifies to its language") {
    val wrong = LangId.ordered.flatMap { lang =>
      val got = LangId.detect(LangId.testSentences(lang))
      if (got == lang) None else Some(s"$lang -> $got")
    }
    assert(wrong.isEmpty, s"misclassified: ${wrong.mkString(", ")}")
  }

  test("ordered covers exactly the test-sentence languages") {
    assert(LangId.ordered.toSet == LangId.testSentences.keySet)
    assert(LangId.ordered.distinct == LangId.ordered)
  }

  test("script short-circuits") {
    assert(LangId.detect("안녕하세요 여러분 반갑습니다 오늘 날씨가 좋네요") == "ko")
    assert(LangId.detect("こんにちは、今日はとても良い天気ですね。") == "ja")
    assert(LangId.detect("你好今天天气很好我们去公园散步吧") == "zh")
    assert(LangId.detect("Γεια σας, σήμερα ο καιρός είναι πολύ καλός.") == "el")
  }

  test("degenerate inputs are und") {
    assert(TextOps.detectLanguage(null) == "und")
    assert(TextOps.detectLanguage("") == "und")
    assert(TextOps.detectLanguage("x") == "und")
    assert(LangId.detect("12345 67890 !!!") == "und")
  }

  test("detect is total on arbitrary unicode") {
    val rng = new graft.corpus.CorpusGen.Rng(23)
    for (_ <- 0 until 300) {
      val n = rng.nextInt(200)
      val s = new String(Array.fill(n)(rng.nextInt(0x2fff).toChar))
      val out = LangId.detect(s)
      assert(out == "und" || LangId.ordered.contains(out), out)
    }
  }

  test("legacy short-sentence checks still pass") {
    assert(TextOps.detectLanguage("der hund ist nicht in das haus und der garten") == "de")
    assert(TextOps.detectLanguage("le chat est dans la maison et le jardin") == "fr")
  }
}
