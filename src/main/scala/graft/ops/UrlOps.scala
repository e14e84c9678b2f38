package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Crawl-grade URL operators — the normalization a web-scale pipeline
  * runs between the WARC source and per-URL/per-domain dedup or quota
  * capping (cf. the URL frontier/dedup stages of any crawl corpus
  * pipeline; beyond the reference's scope, per the builder contract).
  *
  * Everything is a pure codegen'd `Column` expression chain (regexp +
  * array ops, no UDF), so canonicalization fuses into the scan stage and
  * at 100 TB the only exchange a URL-dedup needs is on the canonical
  * string's 64-bit hash.
  *
  * Canonical form (the common subset of the Safe Browsing / crawler
  * conventions, chosen to be engine-portable so a DuckDB oracle can
  * replay it):
  *  - scheme and host lowercased; fragment dropped
  *  - leading `www.` dropped; default port (`:80` http, `:443` https)
  *    dropped, other ports kept
  *  - tracking params dropped (`utm_*`, `gclid`, `fbclid`, `ref`),
  *    remaining query params sorted for order-insensitivity
  *  - empty path becomes `/`; other trailing slashes trimmed
  */
object UrlOps {

  // per-anchor whitespace collapse, precompiled (String.replaceAll
  // recompiles the pattern on every call — this runs per <a> element)
  private val AnchorWs = java.util.regex.Pattern.compile("\\s+")

  private val TrackingRe = "^(utm_[^=]*|gclid|fbclid|ref)="

  def schemeOf(url: Column): Column =
    lower(regexp_extract(url, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))

  /** lowercased host, `www.` and scheme-default port stripped. */
  def hostOf(url: Column): Column = {
    val hostPort = lower(regexp_extract(url, "^[^:/?#]+://([^/?#]+)", 1))
    val noWww = regexp_replace(hostPort, "^www\\.", "")
    when(schemeOf(url) === "http", regexp_replace(noWww, ":80$", ""))
      .when(schemeOf(url) === "https", regexp_replace(noWww, ":443$", ""))
      .otherwise(noWww)
  }

  def pathOf(url: Column): Column = {
    val p = regexp_extract(url, "^[^:/?#]+://[^/?#]*([^?#]*)", 1)
    val trimmed = regexp_replace(p, "/+$", "")
    when(trimmed === "", lit("/")).otherwise(trimmed)
  }

  /** Query string with tracking params dropped and the rest sorted;
    * empty string when nothing survives. */
  def queryOf(url: Column): Column = {
    val raw = regexp_extract(url, "\\?([^#]*)", 1)
    val params = filter(split(raw, "&"),
      p => length(p) > 0 && not(p.rlike(TrackingRe)))
    when(size(params) > 0, array_join(array_sort(params), "&"))
      .otherwise(lit(""))
  }

  def canonicalizeUrl(url: Column): Column = {
    val q = queryOf(url)
    concat(schemeOf(url), lit("://"), hostOf(url), pathOf(url),
      when(q === "", lit("")).otherwise(concat(lit("?"), q)))
  }

  /** Country-code second-level domains where the registrable unit is
    * three labels (`example.co.uk`), from the public-suffix list's
    * best-known entries — a deliberately small deterministic subset (the
    * full PSL is a data file a deployment would broadcast). */
  private val CcSlds = Seq("co.uk", "org.uk", "ac.uk", "gov.uk", "co.jp",
    "co.in", "co.nz", "co.za", "co.kr", "com.au", "net.au", "org.au",
    "com.br", "com.mx", "com.cn", "com.tw", "com.sg", "com.hk")

  /** Registrable domain of a host: last two labels, or last three when
    * the suffix is a known cc-SLD. A port, if present (non-default ports
    * survive [[hostOf]]), is stripped first. */
  def registrableDomain(host: Column): Column = {
    val bare = regexp_replace(host, ":\\d+$", "")
    val labels = split(bare, "\\.")
    val n = size(labels)
    val lastTwo = concat_ws(".", element_at(labels, -2), element_at(labels, -1))
    val lastThree = concat_ws(".", element_at(labels, -3), lastTwo)
    when(n <= 2, bare)
      .when(lastTwo.isin(CcSlds: _*), lastThree)
      .otherwise(lastTwo)
  }

  /** Crawl blocklist filter: classify each URL as `blocked:host` (its
    * [[hostOf]] host is on the blocked-host list), `blocked:domain` (its
    * [[registrableDomain]] is on the blocked-domain list),
    * `blocked:pattern<i>` (first matching path/query regex, by list
    * position — first-match-wins mirrors how crawl blocklists compose),
    * or `ok`. Host/domain checks run before patterns, hosts before
    * domains (most-specific rule first).
    *
    * Pure codegen'd `when` chain over set-literals and `rlike`s — the
    * lists are the broadcast-sized policy artifact, the filter fuses into
    * the scan; at 100 TB this is a zero-shuffle scan predicate. A
    * deployment with a large blocklist would swap the `isin` literals for
    * a broadcast join on the host hash; the verdict contract stays the
    * same. */
  def urlFilter(url: Column, blockedHosts: Seq[String],
                blockedDomains: Seq[String],
                blockedPatterns: Seq[String]): Column = {
    val host = hostOf(url)
    val dom = registrableDomain(host)
    val rules: Seq[(Column, String)] =
      (if (blockedHosts.isEmpty) Nil
       else Seq((host.isin(blockedHosts.map(_.toLowerCase): _*),
         "blocked:host"))) ++
      (if (blockedDomains.isEmpty) Nil
       else Seq((dom.isin(blockedDomains.map(_.toLowerCase): _*),
         "blocked:domain"))) ++
      blockedPatterns.zipWithIndex.map { case (pat, i) =>
        (url.rlike(pat), s"blocked:pattern$i")
      }
    require(rules.nonEmpty, "urlFilter needs at least one block rule")
    rules.tail
      .foldLeft(when(rules.head._1, lit(rules.head._2))) {
        case (c, (p, v)) => c.when(p, lit(v))
      }
      .otherwise(lit("ok"))
  }

  /** Resolve an `<a href>` against its page URL — the minimal RFC 3986
    * subset a crawl-graph emitter needs: absolute http(s) kept,
    * protocol-relative (`//host/x`) takes the page scheme, root-relative
    * joins the page host, plain relative joins the page directory with
    * `./`/`../` segment collapse. Fragment-only and non-navigational
    * schemes (javascript/mailto/data/tel) yield None. */
  def resolveHref(pageUrl: String, href0: String): Option[String] = {
    val href = if (href0 == null) "" else href0.trim
    if (href.isEmpty) return None
    val lower = href.toLowerCase
    if (lower.startsWith("#") || lower.startsWith("javascript:") ||
        lower.startsWith("mailto:") || lower.startsWith("data:") ||
        lower.startsWith("tel:")) return None
    if (lower.startsWith("http://") || lower.startsWith("https://"))
      return Some(href)
    val m = "^([A-Za-z][A-Za-z0-9+.-]*)://([^/?#]+)([^?#]*).*$".r
    pageUrl match {
      case m(scheme, host, path) =>
        if (href.startsWith("//")) Some(scheme.toLowerCase + ":" + href)
        else {
          val joined =
            if (href.startsWith("/")) href
            else path.substring(0, path.lastIndexOf('/') + 1) + href
          Some(s"${scheme.toLowerCase}://$host${collapseDots(joined)}")
        }
      case _ => None
    }
  }

  /** `/a/./b/../c` → `/a/c`; never escapes above the root. */
  private def collapseDots(path: String): String = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    for (seg <- path.split('/')) seg match {
      case "" | "." => // skip
      case ".." => if (out.nonEmpty) out.remove(out.length - 1)
      case s => out += s
    }
    "/" + out.mkString("/") + (if (path.endsWith("/") && out.nonEmpty) "/" else "")
  }

  /** Crawl-graph edge emitter: parse each page's HTML (the from-scratch
    * DOM walker), resolve every `<a href>` against the page URL, emit
    * distinct (id, dst) edges. Narrow flatMap — the DOM never leaves the
    * task; downstream canonicalization ([[canonicalizeUrl]]) and a
    * groupBy on the 8-byte canon hash are all a PageRank/frontier build
    * needs. */
  def outlinks(spark: org.apache.spark.sql.SparkSession, df: DataFrame,
               idCol: String, htmlCol: String, urlCol: String): DataFrame = {
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(htmlCol), col(urlCol))
      .as[(Long, String, String)]
      .flatMap { case (id, html, url) =>
        graft.extract.HtmlDom.findAll(
            graft.extract.HtmlDom.parse(if (html == null) "" else html), "a")
          .flatMap(_.attrs.get("href"))
          .flatMap(h => resolveHref(url, h))
          .toVector.distinct
          .map(dst => (id, dst))
      }
      .toDF(idCol, "dst")
  }

  /** Robots-exclusion admission filter (RFC 9309, see [[RobotsTxt]]):
    * joins each URL to its host's robots.txt and appends `allowed` — the
    * offline re-application of crawl permissions a training corpus runs
    * for opt-out/licensing audits. A host with no robots row is allowed
    * (the RFC's unavailable-file rule).
    *
    * Scale shape: the robots side is one small row per distinct host
    * (policy-artifact-sized) → broadcast hash join on [[hostOf]]; the
    * URL side stays narrow. Rule evaluation is a mapPartitions with a
    * per-partition parse cache keyed by the robots text, so each
    * distinct robots file is parsed once per task, not once per URL; the
    * matcher itself is regex-free. At 100 TB: one broadcast, zero
    * exchanges of the URL table. */
  def robotsFilter(urls: DataFrame, urlCol: String, robots: DataFrame,
                   hostCol: String, txtCol: String, agent: String)
      : DataFrame = {
    import org.apache.spark.sql.{Encoders, Row}
    val withHost = urls.withColumn("__host", hostOf(col(urlCol)))
    val r = robots.select(col(hostCol).as("__host"),
      col(txtCol).as("__robots"))
    val joined = withHost.join(broadcast(r), Seq("__host"), "left")
      .select(urls.columns.map(col) :+ col("__robots"): _*)
    val outSchema = org.apache.spark.sql.types.StructType(
      urls.schema.fields :+ org.apache.spark.sql.types.StructField(
        "allowed", org.apache.spark.sql.types.BooleanType, nullable = false))
    val urlIdx = joined.schema.fieldIndex(urlCol)
    val txtIdx = joined.schema.length - 1
    joined.mapPartitions { it =>
      val cache = scala.collection.mutable.HashMap
        .empty[String, Seq[(Boolean, String)]]
      it.map { row =>
        val ok =
          if (row.isNullAt(txtIdx)) true
          else {
            val rules = cache.getOrElseUpdate(row.getString(txtIdx),
              RobotsTxt.rulesFor(RobotsTxt.parse(row.getString(txtIdx)), agent))
            RobotsTxt.isAllowed(rules,
              RobotsTxt.pathQueryOf(row.getString(urlIdx)))
          }
        Row.fromSeq(row.toSeq.dropRight(1) :+ ok)
      }
    }(Encoders.row(outSchema))
  }

  private def textOf(n: graft.extract.HtmlDom.HNode): String = n match {
    case graft.extract.HtmlDom.HText(t) => t
    case graft.extract.HtmlDom.HElem(_, _, ch) => ch.map(textOf).mkString
  }

  /** Anchor-text corpus builder — the web-graph signal an LLM pretraining
    * set mines from crawl HTML (anchor text describes the TARGET page;
    * cf. the anchor corpora of classic IR and the link-text datasets
    * distilled from Common Crawl): DOM-walk every `<a href>`, resolve +
    * canonicalize the target, and aggregate per target: total reference
    * count and the dominant anchor string (most frequent; lexicographic
    * tiebreak). Whitespace-collapsed, empty anchors dropped.
    *
    * Scale shape: the DOM walk is the same narrow flatMap as
    * [[outlinks]] (HTML never shuffles). Aggregation is deliberately TWO
    * exchanges (PlanSpec-asserted): first a map-side-combined count on
    * (dst, anchor) — this is the skew defense: a hot target (think a
    * homepage with 10^9 in-links) spreads across its distinct anchors
    * instead of landing on one reducer — then a second exchange of the
    * aggregate-sized (dst, anchor, count) rows for the per-dst window.
    * Partitioning by dst first would be ONE exchange but ships raw
    * uncombined edges into the hot-key partition; count-then-window is
    * the shape that survives web-scale in-link skew. At 100 TB swap dst
    * for its 64-bit hash in the exchanges and join the string back from
    * the winner set. */
  def anchorTexts(spark: org.apache.spark.sql.SparkSession, df: DataFrame,
                  idCol: String, htmlCol: String, urlCol: String)
      : DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val edges = df.select(col(idCol).cast("long"), col(htmlCol), col(urlCol))
      .as[(Long, String, String)]
      .flatMap { case (_, html, url) =>
        graft.extract.HtmlDom.findAll(
            graft.extract.HtmlDom.parse(if (html == null) "" else html), "a")
          .flatMap { a =>
            val text = AnchorWs.matcher(textOf(a).trim).replaceAll(" ")
            if (text.isEmpty) None
            else a.attrs.get("href").flatMap(h => resolveHref(url, h))
              .map(dst => (dst, text))
          }.toVector
      }.toDF("dst0", "anchor")
    val counts = edges
      .select(canonicalizeUrl(col("dst0")).as("dst"), col("anchor"))
      .groupBy("dst", "anchor").agg(count(lit(1)).as("c"))
    val w = Window.partitionBy("dst")
    counts
      .withColumn("rank", row_number().over(
        w.orderBy(col("c").desc, col("anchor").asc)))
      .withColumn("n_refs", sum(col("c")).over(w))
      .filter(col("rank") === 1)
      .select(col("dst"), col("anchor").as("top_anchor"),
        col("n_refs").cast("long").as("n_refs"))
  }

  /** Per-canonical-URL first-seen dedup: keeps the minimum `orderCol` row
    * per canonical URL and counts the collapsed duplicates — the crawl
    * frontier's "have I fetched this" collapse as a batch op. Exchange
    * carries (64-bit canon hash, order key) only; the winner joins back
    * by (hash, order) equality, so URL strings never ride a shuffle. */
  def dedupByCanonicalUrl(df: DataFrame, urlCol: String, orderCol: String)
      : DataFrame = {
    val canon = canonicalizeUrl(col(urlCol)).as("canon_url")
    val withCanon = df.withColumn("canon_url", canonicalizeUrl(col(urlCol)))
      .withColumn("canon_h", xxhash64(col("canon_url")))
    val winners = withCanon
      .groupBy(col("canon_h"))
      .agg(min(col(orderCol)).as(orderCol), count(lit(1)).as("n_dups"))
    withCanon.join(winners, Seq("canon_h", orderCol))
      .drop("canon_h")
  }
}
