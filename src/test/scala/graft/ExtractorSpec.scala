package graft

import graft.core._
import graft.classify.Classifier
import graft.extract._
import org.scalatest.funsuite.AnyFunSuite

/** Pure (no-Spark) extractor goldens, mirroring the reference pytest suite
  * (SURVEY §5, FIXTURES.md §2). */
class ExtractorSpec extends AnyFunSuite {

  private def raw(name: String, bytes: Array[Byte], mime: String = "") =
    RawDoc("t1", name, mime, bytes)

  // Re-creation of the semantic content of tests/fixtures/doc.html —
  // expected values are the published assertions in tests/test_html.py:16-24.
  private val docHtml =
    """<!DOCTYPE html>
      |<html lang="en">
      |  <head>
      |    <meta charset="utf-8"/>
      |    <meta name="description" content="Ingestors description"/>
      |    <meta name="keywords" content="ingestors, key, words"/>
      |    <meta name="news_keywords" content="news, key, words"/>
      |    <title>Ingestors Title</title>
      |    <style>html { font-size: 62.5%; }</style>
      |    <script>var ga = function() { return "tracking junk"; };</script>
      |  </head>
      |  <body>
      |    <section class="container">
      |      <article class="about">
      |        <h1>Ingestors</h1>
      |        <p>
      |          Test web page.
      |          The <a href="https://example.com/x">GitHub page.</a>
      |        </p>
      |        <p>
      |          <form action="https://example.com/login" method="post">
      |            <input type="hidden" value="1" name="embed"/>
      |            <input type="submit" value="Login" />
      |          </form>
      |        </p>
      |      </article>
      |    </section>
      |  </body>
      |</html>
      |""".stripMargin

  test("html: doc.html golden text, title, summary, keywords") {
    val res = HtmlExtractor.extract(raw("doc.html", docHtml.getBytes("UTF-8")))
    assert(res.status == ExtractionResult.Success)
    assert(res.spans.map(s => (s.kind, s.text)) ==
      Vector(("text", "Ingestors Test web page. The GitHub page.")))
    assert(res.properties("title") == Seq("Ingestors Title"))
    assert(res.properties("summary") == Seq("Ingestors description"))
    assert(res.properties("keywords").toSet == Set("ingestors", "key", "words", "news"))
  }

  test("html: text-density main content strips nav/sidebar/footer chrome") {
    val article = "the committee approved the updated budget for the coming " +
      "fiscal year after a long debate over infrastructure spending"
    val html = graft.corpus.CorpusGen.renderBoilerplateHtml("T", article)
    val root = HtmlDom.parse(new String(html, "UTF-8"))
    assert(HtmlDom.mainContent(root) == article)
    // chrome-free pages: main content equals the body text
    val plain = HtmlDom.parse("<html><body><p>only prose here today</p></body></html>")
    assert(HtmlDom.mainContent(plain) == "only prose here today")
    // extractor records the property only when chrome was stripped
    val r = HtmlExtractor.extract(RawDoc("d", "x.html", "text/html", html))
    assert(r.properties.getOrElse("mainText", Nil).headOption.contains(article))
  }

  test("html: og: meta wins over title tag; entities decoded") {
    val h = """<html><head><meta property="og:title" content="OG  Title"/>
              |<title>Tag Title</title></head>
              |<body><p>A&amp;B &lt;ok&gt; &#65;&#x42;</p></body></html>""".stripMargin
    val res = HtmlExtractor.extract(raw("a.html", h.getBytes("UTF-8")))
    assert(res.properties("title") == Seq("OG Title", "Tag Title"))
    assert(res.spans.head.text == "A&B <ok> AB")
  }

  test("html: empty body is success with no spans (test_html.py:39-46)") {
    val res = HtmlExtractor.extract(raw("e.html", "   ".getBytes("UTF-8")))
    assert(res.status == ExtractionResult.Success)
    assert(res.spans.isEmpty)
  }

  test("plain text: size guard fails > 4MiB (documents/plain.py:39)") {
    val res = PlainTextExtractor.extract(
      RawDoc("t", "big.txt", "text/plain", new Array[Byte]((4 << 20) + 1)))
    assert(res.status == ExtractionResult.Failure)
    assert(res.error == "Text file is too large.")
  }

  test("plain text: windows-1252 decode via charset guess") {
    val text = "café zürich"
    val res = PlainTextExtractor.extract(
      raw("a.txt", text.getBytes("windows-1252")))
    assert(res.status == ExtractionResult.Success)
    assert(res.spans.head.text == text)
  }

  test("plain text: utf-16le with BOM") {
    val text = "hello utf sixteen"
    val bytes = Array[Byte](0xff.toByte, 0xfe.toByte) ++ text.getBytes("UTF-16LE")
    val res = PlainTextExtractor.extract(raw("a.txt", bytes))
    assert(res.spans.head.text == text)
  }

  test("csv: rowCount = rows + 1 and per-row spans (support/table.py:17-46)") {
    val csv = "name,country\nUmberto,Italy\nCarlos,Spain\n"
    val res = CsvExtractor.extract(raw("c.csv", csv.getBytes("UTF-8"), "text/csv"))
    assert(res.status == ExtractionResult.Success)
    assert(res.properties("rowCount") == Seq("4")) // 3 rows + 1 (reference quirk)
    assert(res.spans.map(_.text) ==
      Vector("name country", "Umberto Italy", "Carlos Spain"))
    assert(res.properties("columns") == Seq("""["Column 1", "Column 2"]"""))
  }

  test("csv: numeric-only values dropped from spans (util.py:27-42)") {
    val csv = "a,1.5\n2,3\nx,y\n"
    val res = CsvExtractor.extract(raw("c.csv", csv.getBytes("UTF-8"), "text/csv"))
    assert(res.spans.map(_.text) == Vector("a", "x y"))
    assert(res.properties("rowCount") == Seq("4"))
  }

  test("csv: quoted fields with embedded delimiter and newline") {
    val csv = "a,\"x,y\"\n\"l1\nl2\",b\n"
    val res = CsvExtractor.extract(raw("c.csv", csv.getBytes("UTF-8"), "text/csv"))
    assert(res.spans.map(_.text) == Vector("a x,y", "l1\nl2 b"))
  }

  test("csv: semicolon dialect sniffed") {
    val csv = "a;b;c\nd;e;f\ng;h;i\n"
    val res = CsvExtractor.extract(raw("c.csv", csv.getBytes("UTF-8"), "text/csv"))
    assert(res.spans.map(_.text) == Vector("a b c", "d e f", "g h i"))
  }

  test("json: string leaves in traversal order, numbers filtered") {
    val j = """{"a": "first", "b": [{"c": "second"}, "3.5", "third"], "d": 7}"""
    val res = JsonExtractor.extract(raw("j.json", j.getBytes("UTF-8"), "application/json"))
    assert(res.status == ExtractionResult.Success)
    assert(res.spans.map(s => (s.text, s.offset)) ==
      Vector(("first", 0), ("second", 1), ("third", 3)))
  }

  test("json: invalid json is a ProcessingException (jsonfile.py:39-43)") {
    val res = JsonExtractor.extract(raw("j.json", "{bad".getBytes, "application/json"))
    assert(res.status == ExtractionResult.Failure)
    assert(res.error.startsWith("Cannot parse JSON file"))
  }

  test("xml: text walk + tabular bodyHtml (documents/xml.py)") {
    val x = "<?xml version=\"1.0\"?><root><a>hello</a><b><c>world</c></b></root>"
    val res = XmlExtractor.extract(raw("x.xml", x.getBytes("UTF-8"), "text/xml"))
    assert(res.status == ExtractionResult.Success)
    assert(res.spans.head.text == "hello world")
    val html = res.properties("bodyHtml").head
    assert(html.contains("<table>") && html.contains("<p>root</p>") &&
      html.contains("<p>hello</p>"))
  }

  test("xml: external entities are not resolved (support/xml.py safe parse)") {
    val x = """<?xml version="1.0"?><!DOCTYPE r [<!ENTITY e SYSTEM "file:///etc/passwd">]><r>&e;</r>"""
    val res = XmlExtractor.extract(raw("x.xml", x.getBytes("UTF-8"), "text/xml"))
    // either parse failure or empty expansion — never file content
    if (res.status == ExtractionResult.Success)
      assert(!res.spans.exists(_.text.contains("root:")))
  }

  test("zip: members become children; hostile paths sanitized (test_packages.py:15-32)") {
    val zip = graft.corpus.CorpusGen.renderZip(Seq(
      ("ok.txt", "safe".getBytes),
      ("../../etc/evil.txt", "bad".getBytes),
      ("dir/sub.txt", "nested".getBytes)))
    val res = ZipExtractor.extract(raw("a.zip", zip, "application/zip"))
    assert(res.status == ExtractionResult.Success)
    assert(res.children.map(_.file_name) ==
      Vector("ok.txt", "etc/evil.txt", "dir/sub.txt"))
  }

  test("zip: invalid zip fails (packages/zip.py:39-40)") {
    val res = ZipExtractor.extract(raw("a.zip", "not a zip".getBytes, "application/zip"))
    assert(res.status == ExtractionResult.Failure)
    assert(res.error.startsWith("Invalid ZIP file"))
  }

  test("gzip: child named minus extension (packages/__init__.py:39-57)") {
    val gz = graft.corpus.CorpusGen.renderGzip("payload text here".getBytes)
    val res = GzipExtractor.extract(raw("notes.txt.gz", gz, "application/gzip"))
    assert(res.children.map(_.file_name) == Vector("notes.txt"))
    assert(new String(res.children.head.bytes) == "payload text here")
  }

  test("tar: ustar members extracted") {
    val tar = graft.corpus.CorpusGen.renderTar(Seq(
      ("a.txt", "alpha".getBytes), ("d/b.txt", "beta".getBytes)))
    val res = TarExtractor.extract(raw("a.tar", tar, "application/x-tar"))
    assert(res.status == ExtractionResult.Success)
    assert(res.children.map(c => (c.file_name, new String(c.bytes))) ==
      Vector(("a.txt", "alpha"), ("d/b.txt", "beta")))
  }

  test("vcard: person fields parsed") {
    val v = "BEGIN:VCARD\r\nVERSION:3.0\r\nFN:John Doe\r\nEMAIL;TYPE=work:John.Doe@Example.com\r\nTEL:+1 555 0100\r\nEND:VCARD\r\n"
    val res = VCardExtractor.extract(raw("john-doe.vcf", v.getBytes, "text/vcard"))
    assert(res.properties("peopleMentioned") == Seq("John Doe"))
    assert(res.properties("emailMentioned") == Seq("john.doe@example.com"))
    assert(res.spans.map(_.text) == Vector("John Doe"))
  }

  test("ics: events and organizers parsed") {
    val ics = "BEGIN:VCALENDAR\r\nBEGIN:VEVENT\r\nSUMMARY:Team Meetup\r\nORGANIZER:mailto:host@example.com\r\nEND:VEVENT\r\nEND:VCALENDAR\r\n"
    val res = CalendarExtractor.extract(raw("meetup.ics", ics.getBytes, "text/calendar"))
    assert(res.properties("eventsMentioned") == Seq("Team Meetup"))
    assert(res.properties("emailMentioned") == Seq("host@example.com"))
  }

  test("docx: paragraphs + core properties (tests/test_pdf.py:110-123 shape)") {
    val contentTypes =
      """<?xml version="1.0"?><Types xmlns="x">
        |<Override PartName="/word/document.xml" ContentType="application/vnd.openxmlformats-officedocument.wordprocessingml.document.main+xml"/>
        |</Types>""".stripMargin
    val docXml =
      """<?xml version="1.0"?><w:document xmlns:w="ns"><w:body>
        |<w:p><w:r><w:t>Hello, World!</w:t></w:r></w:p>
        |<w:p><w:r><w:t>Second</w:t></w:r><w:r><w:t>para</w:t></w:r></w:p>
        |</w:body></w:document>""".stripMargin
    val core =
      """<?xml version="1.0"?><cp:coreProperties xmlns:cp="c" xmlns:dc="d" xmlns:dcterms="t">
        |<dc:title>Doc Title</dc:title><dc:creator>An Author</dc:creator>
        |<dcterms:created>2015-09-07T10:57:00Z</dcterms:created>
        |</cp:coreProperties>""".stripMargin
    val zip = graft.corpus.CorpusGen.renderZip(Seq(
      ("[Content_Types].xml", contentTypes.getBytes),
      ("word/document.xml", docXml.getBytes),
      ("docProps/core.xml", core.getBytes)))
    val res = OoxmlExtractor.extract(raw("hello.docx", zip))
    assert(res.status == ExtractionResult.Success)
    assert(res.spans.map(_.text) == Vector("Hello, World!", "Second para"))
    assert(res.properties("title") == Seq("Doc Title"))
    assert(res.properties("authoredAt") == Seq("2015-09-07T10:57:00"))
  }

  test("dispatch totality: random bytes never throw, always classify or fail cleanly") {
    val rng = new graft.corpus.CorpusGen.Rng(123)
    for (i <- 0 until 200) {
      val n = rng.nextInt(2000)
      val bytes = Array.fill(n)(rng.nextLong().toByte)
      val ing = graft.pipeline.Dispatch.ingest(s"f$i.bin", "", bytes)
      assert(ing.result.status == ExtractionResult.Success ||
        ing.result.status == ExtractionResult.Failure)
    }
  }
}
