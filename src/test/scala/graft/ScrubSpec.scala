package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.Scrub

/** ops/Scrub: PII redaction kernels, boilerplate-line removal, and
  * stratified sampling — hand-built cases for the properties the
  * formula-replay gates (q_pii_redact, q_boilerplate,
  * q_sample_stratified) can't isolate: pattern edges, false-positive
  * resistance, the drop-everywhere rule, and sample monotonicity. */
class ScrubSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def redactOne(s: String): (String, Long, Long, Long) = {
    val r = Seq(s).toDF("t")
      .select(Scrub.redactPii(col("t")).as("red"), Scrub.piiCounts(col("t")).as("c"))
      .select(col("red"), col("c.n_emails"), col("c.n_phones"), col("c.n_ips"))
      .head()
    (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))
  }

  test("PII redaction finds and replaces emails, phones, IPs") {
    assert(redactOne("write to a.b+tag@sub.example.co.uk today") ==
      ("write to <EMAIL> today", 1L, 0L, 0L))
    assert(redactOne("call +1-555-012-3456 or (555) 012-3456 or 555-012-3456") ==
      ("call <PHONE> or <PHONE> or <PHONE>", 0L, 3L, 0L))
    assert(redactOne("servers 10.0.0.1 and 255.255.255.255 are up") ==
      ("servers <IP> and <IP> are up", 0L, 0L, 2L))
  }

  test("PII patterns do not cross-match or over-match") {
    // 300-octet quad is not an IP; 2-group digits are not a phone
    assert(redactOne("version 300.1.2.999 build 12-3456") ==
      ("version 300.1.2.999 build 12-3456", 0L, 0L, 0L))
    // an IP is not eaten by the phone pattern, a phone not by the IP one
    assert(redactOne("ip 192.168.123.456 no") == ("ip 192.168.123.456 no", 0L, 0L, 0L))
    assert(redactOne("mixed user@ex.net 10.1.2.3 +1-555-111-2222") ==
      ("mixed <EMAIL> <IP> <PHONE>", 1L, 1L, 1L))
  }

  test("URL extraction, host parsing, and blocklist matching") {
    val r = Seq(
      "no urls here at all",
      "one https://a.example.org/x and http://b.example.net two",
      "blocked http://evil.example.com/payload end")
      .toDF("t")
      .select(size(Scrub.extractUrls(col("t"))).as("n"),
        array_join(Scrub.urlHosts(col("t")), ",").as("hosts"),
        Scrub.domainBlocked(col("t"), Seq("evil.example.com")).as("blocked"))
      .collect()
    assert(r(0).getInt(0) == 0 && r(0).getString(1) == "" && !r(0).getBoolean(2))
    assert(r(1).getInt(0) == 2 &&
      r(1).getString(1) == "a.example.org,b.example.net" && !r(1).getBoolean(2))
    assert(r(2).getInt(0) == 1 && r(2).getBoolean(2))
  }

  test("boilerplate lines drop everywhere, unique lines survive in order") {
    val df = Seq(
      (1L, Seq("cookie banner", "real content one", "footer")),
      (2L, Seq("cookie banner", "real content two", "footer")),
      (3L, Seq("cookie banner", "real content three")),
      (4L, Seq("footer", "cookie banner")), // boilerplate-only doc
      (5L, Seq.empty[String])               // empty doc survives as empty
    ).toDF("id", "lines")
    val out = Scrub.removeBoilerplateLines(df, "id", "lines", minDocs = 3L)
      .orderBy("id")
      .select(col("id"), col("clean_lines"), col("n_kept"), col("n_dropped"))
      .collect()
    assert(out.map(_.getSeq[String](1).toList).toList == List(
      List("real content one"), List("real content two"),
      List("real content three"), Nil, Nil))
    assert(out.map(r => (r.getLong(2), r.getLong(3))).toList ==
      List((1L, 2L), (1L, 2L), (1L, 1L), (0L, 2L), (0L, 0L)))
  }

  test("boilerplate threshold counts DISTINCT docs, not occurrences") {
    // "x" appears 3 times but only in 2 docs -> kept at minDocs=3
    val df = Seq((1L, Seq("x", "x", "a")), (2L, Seq("x", "b")))
      .toDF("id", "lines")
    val out = Scrub.removeBoilerplateLines(df, "id", "lines", minDocs = 3L)
    assert(out.agg(sum("n_dropped")).head().getLong(0) == 0L)
  }

  test("redaction is idempotent (placeholders contain no PII shapes)") {
    val texts = Seq(
      "mail a.b@c.org call +1-555-111-2222 ip 10.1.2.3",
      "<EMAIL> already redacted 255.0.0.1 and (555) 123-4567")
    val df = texts.toDF("t")
    val once = df.select(Scrub.redactPii(col("t")).as("r"))
    val twice = once.select(Scrub.redactPii(col("r")).as("r"))
    assert(once.as[String].collect().toSeq == twice.as[String].collect().toSeq)
  }

  test("boilerplate output is invariant to document order") {
    val docs = Seq(
      (1L, Seq("dup", "a")), (2L, Seq("dup", "b")), (3L, Seq("dup", "c")))
    def run(rows: Seq[(Long, Seq[String])]) =
      Scrub.removeBoilerplateLines(rows.toDF("id", "lines"), "id", "lines", 3L)
        .select("id", "clean_lines").orderBy("id")
        .as[(Long, Seq[String])].collect().toSeq
    assert(run(docs) == run(docs.reverse))
  }

  test("weighted sample favors heavy rows, deterministic, weight-monotone") {
    val df = (0L until 1000L).map(i => (i, if (i < 100) 50.0 else 1.0))
      .toDF("k", "w")
    def ids(frame: org.apache.spark.sql.DataFrame) =
      Scrub.weightedSampleTopK(frame, "k", "w", 200)
        .select("k").as[Long].collect().toSet
    val s1 = ids(df)
    assert(s1 == ids(df), "same input must reproduce the same sample")
    // 100 keys carry 50x weight: ~83% of total mass; nearly all should
    // make a 200-slot sample (expected ~100, allow >= 85)
    assert(s1.count(_ < 100L) >= 85, s"heavy keys drawn: ${s1.count(_ < 100L)}")
    // raising one key's weight can only keep or add it
    val bumped = df.withColumn("w",
      when(col("k") === 999L, lit(1000.0)).otherwise(col("w")))
    assert(ids(bumped).contains(999L) || !s1.contains(999L))
    // zero/negative weights are excluded
    val z = df.withColumn("w", when(col("k") < 500, lit(0.0)).otherwise(col("w")))
    assert(ids(z).forall(_ >= 500L))
  }

  test("stratified sample is deterministic, rate-ordered, and key-monotone") {
    val df = (0L until 2000L).map(i => (i, s"src${i % 4}")).toDF("k", "s")
    def sample(bp: Int) =
      Scrub.stratifiedSample(df, "s", "k", Map("src0" -> bp), defaultBp = 0)
        .select("k").as[Long].collect().toSet
    val s25 = sample(2500); val s50 = sample(5000); val s50b = sample(5000)
    assert(s50 == s50b, "same thresholds must reproduce the same sample")
    assert(s25.subsetOf(s50), "raising the rate must keep every sampled key")
    // 500 src0 keys at 25% / 50%: binomial mean 125 / 250, allow 4 sigma
    assert(math.abs(s25.size - 125) < 40 && math.abs(s50.size - 250) < 45,
      s"sizes ${s25.size}/${s50.size} far from 125/250")
    // thresholds only touch their stratum
    val other = Scrub.stratifiedSample(df, "s", "k",
      Map("src0" -> 0), defaultBp = 10000)
    assert(other.filter(col("s") === "src0").count() == 0L)
    assert(other.count() == 1500L)
  }
}
