package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-scrubbing operators for training-data pipelines: PII
  * redaction, boilerplate-line removal (CCNet-style), and
  * deterministic stratified sampling. The reference has no
  * counterpart (builder's-brief surface, like ops/TextAnalysis).
  *
  * All three are shaped for the 100 TB case:
  *  - PII redaction is a pure per-row projection (regexp kernels
  *    inside whole-stage codegen, no UDFs, nothing shuffles);
  *  - boilerplate removal shuffles only (hash, pos, id) ints for the
  *    frequency count — document text never rides a shuffle except
  *    the single final id-join that re-attaches results;
  *  - stratified sampling is a map-side filter on an md5 bucket
  *    (deterministic across runs/engines — the q_split_hash trick),
  *    so it composes with resumable ingest: re-running the sample
  *    over a grown corpus keeps every previously-sampled row.
  */
object Scrub {

  // ---------------------------------------------------------------
  // PII redaction
  // ---------------------------------------------------------------

  /** Email addresses (local@domain.tld). */
  val emailRe = "[A-Za-z0-9._%+\\-]+@[A-Za-z0-9.\\-]+\\.[A-Za-z]{2,}"

  /** NANP-ish phone numbers: optional +CC-, then 3-3-4 digit groups
    * with dash/space/paren separators. Deliberately does NOT accept
    * '.' separators: dotted digit quads are IPv4 territory and a
    * dot-tolerant phone pattern would eat them. */
  val phoneRe = "(\\+\\d{1,2}-)?(\\(\\d{3}\\) |\\d{3}-)\\d{3}-\\d{4}"

  /** Strict dotted-quad IPv4 (each octet 0-255, word-bounded). */
  val ipv4Re =
    "\\b(25[0-5]|2[0-4]\\d|1?\\d?\\d)(\\.(25[0-5]|2[0-4]\\d|1?\\d?\\d)){3}\\b"

  /** Per-category PII match counts, computed on the ORIGINAL text
    * (the three patterns are mutually exclusive on any input: emails
    * need '@', phones dashed digit groups, IPs dotted quads). */
  def piiCounts(text: Column): Column = struct(
    regexp_count(text, lit(emailRe)).cast("long").as("n_emails"),
    regexp_count(text, lit(phoneRe)).cast("long").as("n_phones"),
    regexp_count(text, lit(ipv4Re)).cast("long").as("n_ips"))

  /** Redacted text AND the per-category counts from ONE fused scan
    * (struct: redacted, n_emails, n_phones, n_ips) — the shape a
    * pipeline that both scrubs and audits wants: `piiCounts` +
    * `redactPii` separately costs four full regexp passes per doc,
    * this costs one. */
  def piiScrub(text: Column): Column =
    org.apache.spark.sql.graft.CatalystBridge.column(
      graft.functions.PiiScrubExpr(
        org.apache.spark.sql.graft.CatalystBridge.expression(text)))

  /** Text with every PII span replaced by its category placeholder.
    * ONE fused scan (native expression, graft.functions.ScrubKernel):
    * an alternation with email first (its local part may contain
    * digits-with-dashes a later alternative should never see), then
    * phones, then IPs — same replacements as the former three
    * sequential regexp_replace passes (mutually exclusive patterns)
    * at a third of the text rewrites. */
  def redactPii(text: Column): Column =
    org.apache.spark.sql.graft.CatalystBridge.column(
      graft.functions.PiiRedactExpr(
        org.apache.spark.sql.graft.CatalystBridge.expression(text)))

  // ---------------------------------------------------------------
  // URL / domain filtering
  // ---------------------------------------------------------------

  /** In-text URLs (scheme-anchored, up to whitespace). */
  val urlRe = "https?://\\S+"

  /** All URLs appearing in a document. */
  def extractUrls(text: Column): Column =
    regexp_extract_all(text, lit(urlRe), lit(0))

  /** Hosts of all in-text URLs, via Spark's native parse_url (applied
    * to the already-extracted short tokens — the lambda variable, so
    * nothing heavy is captured per element). */
  def urlHosts(text: Column): Column =
    transform(extractUrls(text), u => parse_url(u, lit("HOST")))

  /** True when any in-text URL's host is on the blocklist — the
    * domain-blocklist filter every crawl pipeline runs. Map-side only:
    * regex + parse_url + array overlap inside codegen, no shuffle, no
    * UDF; the blocklist ships as a literal array (for
    * 100k+-domain lists, broadcast-join the exploded hosts instead). */
  def domainBlocked(text: Column, blocklist: Seq[String]): Column =
    arrays_overlap(urlHosts(text),
      array(blocklist.map(lit).toIndexedSeq: _*))

  // ---------------------------------------------------------------
  // Boilerplate-line removal
  // ---------------------------------------------------------------

  /** Drop every line that occurs in >= `minDocs` DISTINCT documents
    * (header/footer/cookie-banner boilerplate — the CCNet rule).
    *
    * Input: `idCol` plus `linesCol: array<string>` (caller chooses
    * the line split — newline, sentence, or token-window). Output:
    * one row per input row with `clean_lines` (survivors, original
    * order), `n_kept`, `n_dropped`.
    *
    * Scale shape: lines are hashed IN PLACE (xxhash64 — 64-bit, the
    * same collision-odds argument as decontamination's shingle join),
    * so the explode/count/semi-join stages shuffle only
    * (hash, pos, id) ints; the surviving-position sets come back as
    * small int arrays and the text is rebuilt from the ORIGINAL array
    * with an index filter. Document text crosses exactly one
    * exchange: the final id-join.
    */
  def removeBoilerplateLines(df: DataFrame, idCol: String, linesCol: String,
                             minDocs: Long): DataFrame = {
    val hashes = df.select(col(idCol),
      transform(col(linesCol), l => xxhash64(l)).as("hs"))
    val exploded = hashes
      .select(col(idCol), posexplode(col("hs")).as(Seq("pos", "h")))
    val frequent = exploded
      .groupBy(col("h"))
      .agg(count_distinct(col(idCol)).as("nd"))
      .filter(col("nd") >= minDocs)
      .select(col("h"))
    // positions to drop, per doc — usually a short array (AQE
    // broadcasts `frequent` when it is small; at adversarial scale it
    // stays a shuffled semi-join on int keys)
    val dropped = exploded
      .join(frequent, Seq("h"), "left_semi")
      .groupBy(col(idCol))
      .agg(collect_set(col("pos")).as("_dropped_pos"))
    df.join(dropped, Seq(idCol), "left")
      .withColumn("_dropped_pos",
        coalesce(col("_dropped_pos"), array().cast("array<int>")))
      .withColumn("clean_lines",
        filter(col(linesCol),
          (_, i) => !array_contains(col("_dropped_pos"), i)))
      .withColumn("n_kept", size(col("clean_lines")).cast("long"))
      .withColumn("n_dropped",
        (size(col(linesCol)) - size(col("clean_lines"))).cast("long"))
      .drop("_dropped_pos")
  }

  /** Fixed-width token-window lines (the line split used by the gate
    * fixture): line i = tokens [i*width, (i+1)*width), last line may
    * be short. Empty/blank text -> zero lines. One compiled pass
    * (graft.functions.TokenWindowLines) — the per-line
    * transform/slice/array_join spelling it replaces evaluated
    * interpreted lambdas per line (and needed a lambda-binding trick
    * just to avoid re-splitting the document per line). */
  def tokenWindowLines(text: Column, width: Int): Column =
    graft.functions.TextHashFunctions.tokenWindowLines(text, width)

  // ---------------------------------------------------------------
  // Stratified sampling
  // ---------------------------------------------------------------

  /** Deterministic weighted sampling WITHOUT replacement (top-k by
    * A-ES priority, Efraimidis-Spirakis): each row gets a uniform
    * u from its salted md5 bucket and priority ln(u)/w — the top-k
    * priorities are a weighted-without-replacement sample (rows with
    * twice the weight are twice as likely per slot). The "sample 10k
    * docs proportional to quality score" source-mixing op.
    *
    * Deterministic in the key (same corpus -> same sample; DuckDB can
    * replay it exactly), and lowered as TakeOrderedAndProject —
    * per-partition k-heaps, no global sort, no shuffle beyond the
    * k-row merge. Rows with non-positive weight are excluded (they
    * have zero sampling mass). */
  def weightedSampleTopK(df: DataFrame, keyCol: String, weightCol: String,
                         k: Int, salt: String = "wsmp"): DataFrame = {
    require(k > 0, "weightedSampleTopK: k must be positive")
    val bucket =
      conv(substring(md5(concat(lit(salt + ":"),
        col(keyCol).cast("string"))), 1, 4), 16, 10).cast("int") % 10000
    val u = (bucket + 1).cast("double") / 10001.0 // (0, 1], never ln(0)
    df.filter(col(weightCol) > 0)
      .orderBy((log(u) / col(weightCol)).desc)
      .limit(k)
  }

  /** Deterministic per-stratum sampling: a row survives iff its md5
    * bucket (0..9999, salted on `keyCol`) is below its stratum's
    * threshold in basis points (10000 = keep all, 2500 = 25%).
    * Strata not in `thresholdsBp` use `defaultBp`.
    *
    * md5 rather than xxhash64 so an external system (or the DuckDB
    * oracle) can reproduce the exact sample; deterministic in the KEY
    * (not the row), so re-sampling a grown corpus is a superset —
    * the property that makes the sample stable under incremental
    * ingest. Pure map-side filter: no shuffle, pushes nothing, scans
    * at columnar speed.
    */
  def stratifiedSample(df: DataFrame, strataCol: String, keyCol: String,
                       thresholdsBp: Map[String, Int], defaultBp: Int,
                       salt: String = "smp"): DataFrame = {
    require(defaultBp >= 0 && defaultBp <= 10000, s"defaultBp $defaultBp")
    thresholdsBp.foreach { case (k, v) =>
      require(v >= 0 && v <= 10000, s"threshold $k -> $v out of [0,10000]") }
    val bucket =
      conv(substring(md5(concat(lit(salt + ":"),
        col(keyCol).cast("string"))), 1, 4), 16, 10).cast("int") % 10000
    val threshold = thresholdsBp.foldLeft(lit(defaultBp)) {
      case (acc, (stratum, bp)) =>
        when(col(strataCol) === stratum, lit(bp)).otherwise(acc)
    }
    df.filter(bucket < threshold)
  }
}
