package graft.extract

import scala.collection.mutable.ArrayBuffer

/** From-scratch tolerant HTML parser (jsoup-style tokenizer + tree builder).
  *
  * Built to replicate the observable behavior the reference gets from
  * lxml.html in `/root/reference/ingestors/support/html.py`:
  *   - text extraction = all text nodes in document order, skipping the
  *     subtrees of script/style/head, joined by spaces and collapsed
  *     (`support/html.py:46-63`);
  *   - metadata via `meta[@property=...]` / `meta[@name=...]` and
  *     `<title>` lookup (`support/html.py:21-44`).
  *
  * Not a full HTML5 tree construction algorithm: tags are matched by a
  * simple open-element stack; mismatched end tags are ignored; void and
  * raw-text elements are handled; entities are decoded. This is sufficient
  * for text/metadata extraction semantics (we never need sibling-correct
  * reparenting).
  */
object HtmlDom {

  sealed trait HNode
  final case class HText(text: String) extends HNode
  final case class HElem(tag: String, attrs: Map[String, String],
                         children: Vector[HNode]) extends HNode

  private val voidElements = Set(
    "area", "base", "br", "col", "embed", "hr", "img", "input", "link",
    "meta", "param", "source", "track", "wbr")

  private val rawTextElements = Set("script", "style", "textarea", "title", "xmp")

  private val namedEntities: Map[String, String] = Map(
    "amp" -> "&", "lt" -> "<", "gt" -> ">", "quot" -> "\"", "apos" -> "'",
    "nbsp" -> " ", "copy" -> "©", "reg" -> "®",
    "trade" -> "™", "hellip" -> "…", "mdash" -> "—",
    "ndash" -> "–", "lsquo" -> "‘", "rsquo" -> "’",
    "ldquo" -> "“", "rdquo" -> "”", "laquo" -> "«",
    "raquo" -> "»", "times" -> "×", "shy" -> "­",
    "eacute" -> "é", "egrave" -> "è", "agrave" -> "à",
    "uuml" -> "ü", "ouml" -> "ö", "auml" -> "ä",
    "szlig" -> "ß", "ccedil" -> "ç", "ntilde" -> "ñ",
    "deg" -> "°", "middot" -> "·", "bull" -> "•",
    "euro" -> "€", "pound" -> "£", "yen" -> "¥",
    "cent" -> "¢", "sect" -> "§", "para" -> "¶")

  def decodeEntities(s: String): String = {
    if (s.indexOf('&') < 0) return s
    val out = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '&') {
        val semi = s.indexOf(';', i + 1)
        if (semi > i && semi - i <= 12) {
          val name = s.substring(i + 1, semi)
          val resolved: Option[String] =
            if (name.startsWith("#x") || name.startsWith("#X")) {
              try Some(new String(Character.toChars(Integer.parseInt(name.drop(2), 16))))
              catch { case _: Exception => None }
            } else if (name.startsWith("#")) {
              try Some(new String(Character.toChars(Integer.parseInt(name.drop(1)))))
              catch { case _: Exception => None }
            } else namedEntities.get(name)
          resolved match {
            case Some(r) => out.append(r); i = semi + 1
            case None => out.append(c); i += 1
          }
        } else { out.append(c); i += 1 }
      } else { out.append(c); i += 1 }
    }
    out.toString
  }

  private final class Builder(tag: String, val attrs: Map[String, String]) {
    val tagName: String = tag
    val children = new ArrayBuffer[HNode]()
    def build(): HElem = HElem(tagName, attrs, children.toVector)
  }

  /** Parse an HTML string into a synthetic root element. Never throws on
    * malformed markup; an unparseable blob just becomes text. */
  def parse(html: String): HElem = {
    val stack = new ArrayBuffer[Builder]()
    stack += new Builder("#root", Map.empty)

    def appendText(t: String): Unit =
      if (t.nonEmpty) stack.last.children += HText(decodeEntities(t))

    def closeTo(tag: String): Unit = {
      // find deepest matching open element; ignore end tag if none
      var idx = -1
      var k = stack.length - 1
      while (k >= 1 && idx < 0) {
        if (stack(k).tagName == tag) idx = k
        k -= 1
      }
      if (idx >= 1) {
        while (stack.length > idx) {
          val done = stack.remove(stack.length - 1)
          stack.last.children += done.build()
        }
      }
    }

    val n = html.length
    var i = 0
    while (i < n) {
      val lt = html.indexOf('<', i)
      if (lt < 0) { appendText(html.substring(i)); i = n }
      else {
        if (lt > i) appendText(html.substring(i, lt))
        if (lt + 1 >= n) { appendText("<"); i = n }
        else {
          val c1 = html.charAt(lt + 1)
          if (c1 == '!') {
            if (html.startsWith("<!--", lt)) {
              val end = html.indexOf("-->", lt + 4)
              i = if (end < 0) n else end + 3
            } else if (html.regionMatches(true, lt, "<![CDATA[", 0, 9)) {
              val end = html.indexOf("]]>", lt + 9)
              val stop = if (end < 0) n else end
              appendText(html.substring(lt + 9, stop))
              i = if (end < 0) n else end + 3
            } else {
              val end = html.indexOf('>', lt + 2)
              i = if (end < 0) n else end + 1
            }
          } else if (c1 == '?') {
            val end = html.indexOf('>', lt + 2)
            i = if (end < 0) n else end + 1
          } else if (c1 == '/') {
            val end = html.indexOf('>', lt + 2)
            val stop = if (end < 0) n else end
            val name = html.substring(lt + 2, stop).trim.takeWhile(ch => !ch.isWhitespace)
            if (name.nonEmpty && name.forall(isNameChar)) closeTo(name.toLowerCase)
            i = if (end < 0) n else end + 1
          } else if (isNameStart(c1)) {
            val (name, attrs, selfClose, after) = parseTag(html, lt + 1)
            val tag = name.toLowerCase
            i = after
            if (voidElements.contains(tag) || selfClose) {
              stack.last.children += HElem(tag, attrs, Vector.empty)
            } else if (rawTextElements.contains(tag)) {
              // consume raw text until the matching close tag
              val closeIdx = indexOfCloseTag(html, i, tag)
              val raw = html.substring(i, closeIdx._1)
              val textChild =
                if (tag == "title" || tag == "textarea") decodeEntities(raw) else raw
              stack.last.children += HElem(tag, attrs,
                if (raw.nonEmpty) Vector(HText(textChild)) else Vector.empty)
              i = closeIdx._2
            } else {
              stack += new Builder(tag, attrs)
            }
          } else {
            appendText("<")
            i = lt + 1
          }
        }
      }
    }
    while (stack.length > 1) {
      val done = stack.remove(stack.length - 1)
      stack.last.children += done.build()
    }
    stack.head.build()
  }

  private def isNameStart(c: Char): Boolean = c.isLetter
  private def isNameChar(c: Char): Boolean =
    c.isLetterOrDigit || c == '-' || c == '_' || c == ':'

  /** Parse "name attr=val ..." starting right after '<'. Returns
    * (name, attrs, selfClosing, index-after-'>'). */
  private def parseTag(s: String, start: Int): (String, Map[String, String], Boolean, Int) = {
    val n = s.length
    var i = start
    val nameSb = new StringBuilder
    while (i < n && isNameChar(s.charAt(i))) { nameSb.append(s.charAt(i)); i += 1 }
    var attrs = Map.empty[String, String]
    var selfClose = false
    var done = false
    while (!done && i < n) {
      while (i < n && s.charAt(i).isWhitespace) i += 1
      if (i >= n) done = true
      else s.charAt(i) match {
        case '>' => i += 1; done = true
        case '/' =>
          if (i + 1 < n && s.charAt(i + 1) == '>') { selfClose = true; i += 2; done = true }
          else i += 1
        case _ =>
          val keySb = new StringBuilder
          while (i < n && !s.charAt(i).isWhitespace && s.charAt(i) != '=' &&
                 s.charAt(i) != '>' && s.charAt(i) != '/') {
            keySb.append(s.charAt(i)); i += 1
          }
          while (i < n && s.charAt(i).isWhitespace) i += 1
          var value = ""
          if (i < n && s.charAt(i) == '=') {
            i += 1
            while (i < n && s.charAt(i).isWhitespace) i += 1
            if (i < n && (s.charAt(i) == '"' || s.charAt(i) == '\'')) {
              val q = s.charAt(i); i += 1
              val end = s.indexOf(q, i)
              val stop = if (end < 0) n else end
              value = s.substring(i, stop)
              i = if (end < 0) n else end + 1
            } else {
              val vSb = new StringBuilder
              while (i < n && !s.charAt(i).isWhitespace && s.charAt(i) != '>') {
                vSb.append(s.charAt(i)); i += 1
              }
              value = vSb.toString
            }
          }
          if (keySb.nonEmpty)
            attrs += (keySb.toString.toLowerCase -> decodeEntities(value))
      }
    }
    (nameSb.toString, attrs, selfClose, i)
  }

  /** Find `</tag` (case-insensitive) from `from`; returns
    * (rawTextEnd, indexAfterCloseTagGt). */
  private def indexOfCloseTag(s: String, from: Int, tag: String): (Int, Int) = {
    val needle = "</" + tag
    var i = from
    val n = s.length
    while (i < n) {
      val idx = indexOfIgnoreCase(s, needle, i)
      if (idx < 0) return (n, n)
      val after = idx + needle.length
      if (after >= n) return (idx, n)
      val c = s.charAt(after)
      if (c == '>' || c.isWhitespace || c == '/') {
        val gt = s.indexOf('>', after)
        return (idx, if (gt < 0) n else gt + 1)
      }
      i = idx + 1
    }
    (n, n)
  }

  private def indexOfIgnoreCase(s: String, needle: String, from: Int): Int = {
    val n = s.length
    val m = needle.length
    var i = from
    while (i + m <= n) {
      if (s.regionMatches(true, i, needle, 0, m)) return i
      i += 1
    }
    -1
  }

  // ---- query helpers ------------------------------------------------------

  /** All elements in document order. */
  def allElements(root: HElem): Iterator[HElem] = {
    // strict preorder collection: the lazy Iterator-++ version built one
    // ConcatIterator cell per DOM node and dominated the HTML profile
    val buf = Vector.newBuilder[HElem]
    def walk(e: HElem): Unit = {
      buf += e
      e.children.foreach {
        case c: HElem => walk(c)
        case _ => ()
      }
    }
    walk(root)
    buf.result().iterator
  }

  def findAll(root: HElem, tag: String): Iterator[HElem] =
    allElements(root).filter(_.tag == tag)

  /** Concatenated text content of an element's subtree (no skipping). */
  /** Main-content extraction by text-density scoring (the Readability/
    * Boilerpipe family of public heuristics, per the north star's
    * "jsoup-style DOM boilerplate stripping with text-density
    * heuristics"): every block-level element is scored by
    * own-text length × (1 − link-text ratio), discounted for link-heavy
    * navigation/footer chrome; the best-scoring block subtree (with the
    * scores of its block children aggregated) wins. */
  def mainContent(root: HElem): String = {
    val blockTags = Set("div", "article", "main", "section", "td", "body")
    val skipTags = Set("script", "style", "nav", "header", "footer", "aside",
      "noscript", "form")

    /** (textLen, linkTextLen) of a subtree, skipping chrome tags. */
    def measure(n: HNode, inLink: Boolean): (Int, Int) = n match {
      case HText(t) =>
        val len = graft.core.TextUtil.collapseSpaces(t).length
        (len, if (inLink) len else 0)
      case e: HElem if skipTags.contains(e.tag) => (0, 0)
      case e: HElem =>
        val link = inLink || e.tag == "a"
        e.children.foldLeft((0, 0)) { case ((t, l), c) =>
          val (ct, cl) = measure(c, link)
          (t + ct, l + cl)
        }
    }

    def score(e: HElem): Double = {
      val (t, l) = measure(e, inLink = false)
      if (t == 0) 0.0
      // readability-family content score: link-free mass, quadratically
      // discounted by link density — a nav-wrapped parent can't outrun the
      // pure-prose block it contains
      else (t - l).toDouble * (1.0 - l.toDouble / t)
    }

    val candidates = Vector.newBuilder[(HElem, Double, Int)]
    def walk(e: HElem, depth: Int): Unit = {
      if (!skipTags.contains(e.tag)) {
        if (blockTags.contains(e.tag)) candidates += ((e, score(e), depth))
        e.children.foreach { case c: HElem => walk(c, depth + 1); case _ => () }
      }
    }
    walk(root, 0)
    val all = candidates.result()
    if (all.isEmpty) return graft.core.TextUtil.collapseSpaces(textContent(root))
    val top = all.map(_._2).max
    // a parent that only wraps the winner plus link chrome ties with it —
    // among near-ties (within 2%), the DEEPEST block is the content
    val best = all.filter(_._2 >= top * 0.98).maxBy(_._3)._1

    val sb = new StringBuilder
    def emit(n: HNode): Unit = n match {
      case HText(t) => sb.append(t).append(' ')
      case e: HElem => if (!skipTags.contains(e.tag)) e.children.foreach(emit)
    }
    emit(best)
    graft.core.TextUtil.collapseSpaces(sb.toString)
  }

  def textContent(e: HElem): String = {
    val sb = new StringBuilder
    def walk(n: HNode): Unit = n match {
      case HText(t) => sb.append(t)
      case el: HElem => el.children.foreach(walk)
    }
    walk(e)
    sb.toString
  }
}
