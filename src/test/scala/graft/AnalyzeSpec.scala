package graft

import graft.analysis.Analyze
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Analysis-stage semantics beyond the oracle queries: TagAggregator cap
  * parity with the reference (`analysis/aggregate.py:38-60`). */
class AnalyzeSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  test("tag cap is first-come insertion order, not top-frequency") {
    // arrival order: z9 (3 times), a1, m5, b2, c3 — with cap 3 the reference
    // keeps the first 4 distinct keys (`>` quirk: len > MAX_TAGS refuses),
    // regardless of frequency; c3 arrives 5th and is refused.
    val tags = Seq(
      (1L, "emailMentioned", "Z9", 0L),
      (1L, "emailMentioned", "z9", 1L),
      (1L, "emailMentioned", "a1", 2L),
      (1L, "emailMentioned", "m5", 3L),
      (1L, "emailMentioned", "z9", 4L),
      (1L, "emailMentioned", "b2", 5L),
      (1L, "emailMentioned", "c3", 6L)
    ).toDF("doc_id", "prop", "value", "pos")
    val out = Analyze.aggregateTags(tags, maxTagsPerDoc = 3)
      .select("key", "freq").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out == Map("z9" -> 3L, "a1" -> 1L, "m5" -> 1L, "b2" -> 1L), out)
  }

  test("golden: >MAX_TAGS keys keep exactly the first 10001 by arrival") {
    val n = 10002
    val tags = spark.range(n).select(
      lit(1L).as("doc_id"), lit("emailMentioned").as("prop"),
      format_string("k%05d", col("id")).as("value"), col("id").as("pos"))
    val keys = Analyze.aggregateTags(tags).select("key").as[String].collect().toSet
    assert(keys.size == 10001)
    assert(keys.contains("k00000") && keys.contains("k10000"))
    assert(!keys.contains("k10001")) // the 10002nd key is refused
  }

  test("clean_name gate: 4-100 chars, must contain a space (extract.py:27-35)") {
    assert(Analyze.cleanName("John Smith") == Some("John Smith"))
    assert(Analyze.cleanName("  John   Smith  ") == Some("John Smith"))
    assert(Analyze.cleanName("\"Acme Holdings Ltd.\"") == Some("Acme Holdings Ltd"))
    assert(Analyze.cleanName("Cher") == None)          // no space
    assert(Analyze.cleanName("Madonna") == None)       // no space
    assert(Analyze.cleanName("A B") == None)           // <= 4 after cleanup
    assert(Analyze.cleanName("x" * 101) == None)       // > 100 pre-clean
    assert(Analyze.cleanName(null) == None)
  }

  test("EmailIdentity key rules (support/email.py:18-49)") {
    // name + valid email -> keyed on email
    assert(Analyze.personFromLabel("Jane Roe <Jane.Roe@X.test>") ==
      Some(("jane.roe@x.test", "Jane Roe", "jane.roe@x.test")))
    // bare email label: name slot IS an email -> flips into email, name dropped
    assert(Analyze.personFromLabel("someone@x.test") ==
      Some(("someone@x.test", "", "someone@x.test")))
    // invalid email + name > 10 chars -> keyed on lowercased name
    assert(Analyze.personFromLabel("Carlos Santana Junior <not-an-email>") ==
      Some(("carlos santana junior", "Carlos Santana Junior", "")))
    // invalid email + short name -> no stable key, dropped
    assert(Analyze.personFromLabel("Bob B <bad>") == None)
    assert(Analyze.personFromLabel("") == None)
    assert(Analyze.personFromLabel(null) == None)
  }

  test("mentions: only MENTIONS props qualify, detectedSchema stamped") {
    val agg = Analyze.aggregateTags(Seq(
      (1L, "peopleMentioned", "John Smith", 0L),
      (1L, "companiesMentioned", "Acme Holdings Ltd", 1L),
      (1L, "emailMentioned", "a@x.test", 2L)
    ).toDF("doc_id", "prop", "value", "pos"))
    val rows = Analyze.mentions(agg)
      .select("detected_prop", "detected_schema").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(rows == Set(
      "peopleMentioned" -> "Person", "companiesMentioned" -> "Organization"))
  }

  test("extractPatterns pos encodes chunk, pattern family, match order") {
    val spans = Seq(
      (7L, 0, "mail a@x.com then b@x.com and phone +321 456 789"),
      (7L, 1, "later chunk c@x.com")
    ).toDF("doc_id", "span_ord", "text")
    val rows = Analyze.extractPatterns(spans, orderCol = Some("span_ord"))
      .orderBy("pos").select("prop", "value").collect()
      .map(r => (r.getString(0), r.getString(1))).toVector
    assert(rows.head == ("emailMentioned", "a@x.com"))
    assert(rows(1) == ("emailMentioned", "b@x.com"))
    // phone family ranks after emails of the same chunk
    assert(rows.indexWhere(_._1 == "phoneMentioned") > 1)
    // the second chunk's email ranks after every first-chunk tag
    assert(rows.last == ("emailMentioned", "c@x.com"))
  }
}
