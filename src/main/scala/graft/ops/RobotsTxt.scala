package graft.ops

/** From-scratch robots.txt parser + matcher (RFC 9309, the Robots
  * Exclusion Protocol) — the admission rule every crawl-sourced training
  * corpus applies before a page may be fetched, and re-applies offline
  * when licensing/opt-out audits re-filter an existing corpus.
  *
  * Implements the RFC's normative core:
  *  - line syntax `key: value`, `#` comments, case-insensitive keys;
  *    unknown keys (sitemap, crawl-delay, ...) are ignored
  *  - GROUPS: consecutive `user-agent` lines share the rule block that
  *    follows; a `user-agent` line after rules starts a new group
  *  - group selection: the group(s) whose user-agent product token is the
  *    longest case-insensitive prefix of the crawler's agent token win;
  *    `*` groups apply only when no specific group matches (RFC 9309 §2.2.1)
  *  - rule matching over the URI path-and-query (fragment excluded):
  *    byte-prefix match with `*` as any-sequence wildcard and a trailing
  *    `$` anchoring the end (§2.2.2-2.2.3)
  *  - precedence: the LONGEST matching pattern decides; on equal length,
  *    allow wins (§2.2.2). No matching rule, empty group, or no robots
  *    file at all → allowed
  *
  * Reference behavior contract: the reference pipeline ingests already-
  * fetched archives and has no robots stage (`/root/reference/ingestors`
  * contains no fetcher); this operator extends the engine to the crawl
  * side per the builder contract's training-data-pipeline axis. */
object RobotsTxt {

  /** One group: the user-agent tokens it names and its ordered rules as
    * (isAllow, pattern). Patterns are kept verbatim (case-sensitive, per
    * the RFC — paths are case-sensitive). */
  final case class Group(agents: Seq[String], rules: Seq[(Boolean, String)])

  def parse(txt: String): Seq[Group] = {
    val groups = scala.collection.mutable.ArrayBuffer.empty[Group]
    var agents = Vector.empty[String]
    var rules = Vector.empty[(Boolean, String)]
    var inAgents = false // consecutive user-agent lines accumulate
    def flush(): Unit = {
      if (agents.nonEmpty) groups += Group(agents, rules)
      agents = Vector.empty; rules = Vector.empty
    }
    for (raw <- Option(txt).getOrElse("").linesIterator) {
      val line = raw.indexOf('#') match {
        case -1 => raw
        case i  => raw.substring(0, i)
      }
      val colon = line.indexOf(':')
      if (colon > 0) {
        val key = line.substring(0, colon).trim.toLowerCase
        val value = line.substring(colon + 1).trim
        key match {
          case "user-agent" =>
            if (!inAgents) flush()
            inAgents = true
            if (value.nonEmpty) agents :+= value.toLowerCase
          case "allow" | "disallow" if agents.nonEmpty =>
            inAgents = false
            // empty pattern is a no-op rule ("Disallow:" = allow all)
            if (value.nonEmpty) rules :+= ((key == "allow", value))
          // RFC 9309 §2.2.4: records outside the allow/disallow grammar
          // (sitemap, crawl-delay, …) MUST NOT interfere with record-group
          // parsing — "User-agent: a / Crawl-delay: 1 / User-agent: b /
          // Disallow: /" is ONE group covering both agents, so an ignored
          // directive leaves the user-agent accumulation open
          case _ => // no-op
        }
      }
    }
    flush()
    groups.toSeq
  }

  /** The rule set for `agent`: all groups under the longest user-agent
    * token that is a case-insensitive prefix of the agent's product
    * token, falling back to the `*` groups, else empty (= allow all). */
  def rulesFor(groups: Seq[Group], agent: String): Seq[(Boolean, String)] = {
    val tok = agent.toLowerCase.takeWhile(c => c != '/' && c != ' ')
    val specific = groups.flatMap { g =>
      g.agents.filter(a => a != "*" && tok.startsWith(a)).map(a => (a.length, g))
    }
    if (specific.nonEmpty) {
      val best = specific.map(_._1).max
      specific.collect { case (len, g) if len == best => g }.flatMap(_.rules)
    } else groups.filter(_.agents.contains("*")).flatMap(_.rules)
  }

  /** Does `pattern` match `path` (path-and-query, no fragment)?
    * Prefix semantics: the pattern must match a prefix of the path unless
    * it ends in `$` (then it must match the whole path); `*` matches any
    * (possibly empty) character sequence. Iterative greedy-with-backtrack
    * — no regex compilation in the per-URL hot loop. */
  def patternMatches(pattern: String, path: String): Boolean = {
    val anchored = pattern.endsWith("$")
    val pat = if (anchored) pattern.dropRight(1) else pattern
    // segments between '*'s must appear in order; first segment at pos 0
    val segs = pat.split("\\*", -1)
    var pos = 0
    var i = 0
    while (i < segs.length) {
      val seg = segs(i)
      if (i == 0) {
        if (!path.startsWith(seg)) return false
        pos = seg.length
      } else if (i == segs.length - 1 && anchored) {
        // last segment must END the path (and start at/after pos)
        if (!(path.endsWith(seg) && path.length - seg.length >= pos))
          return false
        pos = path.length
      } else {
        val at = path.indexOf(seg, pos)
        if (at < 0) return false
        pos = at + seg.length
      }
      i += 1
    }
    if (anchored && segs.length == 1) pos == path.length else true
  }

  /** RFC 9309 §2.2.2 precedence: longest matching pattern decides;
    * equal-length tie → allow. No match → allowed. */
  def isAllowed(rules: Seq[(Boolean, String)], path: String): Boolean = {
    var bestLen = -1
    var bestAllow = true
    for ((allow, pat) <- rules if patternMatches(pat, path)) {
      val len = pat.length
      if (len > bestLen || (len == bestLen && allow && !bestAllow)) {
        bestLen = len; bestAllow = allow
      }
    }
    bestLen < 0 || bestAllow
  }

  /** path-and-query of a URL, fragment stripped; "/" when absent. */
  def pathQueryOf(url: String): String = {
    val noFrag = url.indexOf('#') match {
      case -1 => url
      case i  => url.substring(0, i)
    }
    val schemeEnd = noFrag.indexOf("://")
    if (schemeEnd < 0) return if (noFrag.startsWith("/")) noFrag else "/"
    val slash = noFrag.indexOf('/', schemeEnd + 3)
    val q = noFrag.indexOf('?', schemeEnd + 3)
    if (slash < 0 && q < 0) "/"
    else if (slash < 0 || (q >= 0 && q < slash)) "/" + noFrag.substring(q)
    else noFrag.substring(slash)
  }

  /** One-shot convenience: is `url` fetchable by `agent` under `txt`? */
  def allowed(txt: String, agent: String, url: String): Boolean =
    isAllowed(rulesFor(parse(txt), agent), pathQueryOf(url))
}
