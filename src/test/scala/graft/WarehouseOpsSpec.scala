package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.ops.{Graphs, Profile, Scd}

/** Profile / SCD2 / PageRank properties the DuckDB gates can't cover:
  * the approx-distinct plan shape and tolerance, merge idempotence,
  * changelog replay, and PageRank's partition-invariance + mass
  * bounds. */
class WarehouseOpsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private lazy val customer =
    Tables.load(spark, "/root/testdata/sf0.01", "customer")

  test("expectations: NULL predicate results count as violations; uniqueness exact") {
    import org.apache.spark.sql.functions._
    val df = Seq[(java.lang.Long, java.lang.Double, String)](
      (1L, 10.0, "ok"), (2L, null, "ok"), (3L, -5.0, null),
      (4L, 20.0, "ok"), (4L, 30.0, "dup"))
      .toDF("id", "price", "tag")
    val rep = graft.ops.Profile.expectations(df,
        Seq("price_positive" -> (col("price") > 0.0),
            "tag_nonnull" -> col("tag").isNotNull),
        uniqueKey = Some("id"))
      .orderBy("check_name")
      .as[(String, Long, Int)].collect().toList
    assert(rep == List(
      ("price_positive", 2L, 0),  // null price AND -5 both violate
      ("tag_nonnull", 1L, 0),
      ("unique_id", 1L, 0)))      // 5 rows, 4 distinct ids
  }

  test("profile: approx distinct is Expand-free and within HLL tolerance") {
    val cols = Seq("c_custkey", "c_nationkey", "c_mktsegment")
    val exact = Profile.profile(customer, cols)
      .select("col_name", "n_distinct").as[(String, Long)].collect().toMap
    val approxDf = Profile.profile(customer, cols, approxDistinct = true)
    // plan shape: the exact variant needs one Expand per the multiple
    // COUNT(DISTINCT)s; the HLL variant must plan without any
    assert(Profile.profile(customer, cols).queryExecution.executedPlan
      .toString.contains("Expand"), "exact profile should use Expand")
    assert(!approxDf.queryExecution.executedPlan.toString.contains("Expand"),
      "approx profile must be Expand-free")
    val approx = approxDf.select("col_name", "n_distinct")
      .as[(String, Long)].collect().toMap
    for ((c, ex) <- exact) {
      val ap = approx(c).toDouble
      assert(math.abs(ap - ex) <= math.max(2.0, 0.1 * ex),
        s"$c: approx $ap vs exact $ex outside 10%")
    }
  }

  test("scd2 merge: idempotent re-send creates zero new versions") {
    val base = customer.select(col("c_custkey"), col("c_acctbal"))
    val dim = Scd.init(base, lit("2020-01-01"))
    val updates = base.filter(col("c_custkey") % 3 === 0)
      .withColumn("c_acctbal", col("c_acctbal") + 5.0)
    val m1 = Scd.merge(dim, updates, "c_custkey", Seq("c_acctbal"),
      lit("2021-01-01")).localCheckpoint(true)
    val n1 = m1.count()
    // re-sending the SAME batch later must be a pure no-op
    val m2 = Scd.merge(m1, updates, "c_custkey", Seq("c_acctbal"),
      lit("2022-01-01")).localCheckpoint(true)
    assert(m2.count() == n1, "identical re-send must not add versions")
    assert(m2.filter(col("valid_from") === "2022-01-01").count() == 0)
    // exactly one open version per key, and closed/open line up
    val openPerKey = m2.filter(col("is_current"))
      .groupBy(col("c_custkey")).count().filter(col("count") =!= 1).count()
    assert(openPerKey == 0, "every key must have exactly one current row")
  }

  test("scd2 fromChangelog: versions chain with no gaps or overlaps") {
    val log = Tables.load(spark, "/root/testdata/sf0.01", "events")
      .filter(col("event_type") === "click").limit(5000)
      .select(col("user_id"), col("ts"), col("event_id"), col("value"))
    val hist = Scd.fromChangelog(log, "user_id", "ts", "event_id",
      Seq("value")).localCheckpoint(true)
    assert(hist.count() == log.count(), "one version per changelog row")
    // each key: exactly one current; valid_to of row k == valid_from
    // of row k+1 under the (ts, tie) order
    assert(hist.filter(col("is_current")).groupBy(col("user_id")).count()
      .filter(col("count") =!= 1).count() == 0)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id"))
      // valid_to tiebreak: equal-ts versions chain in close order
      .orderBy(col("valid_from"), col("valid_to").asc_nulls_last)
    val broken = hist
      .withColumn("next_from", lead(col("valid_from"), 1).over(w))
      .filter(col("next_from").isNotNull &&
        !(col("valid_to") <=> col("next_from")))
      .count()
    assert(broken == 0, s"$broken chain breaks")
  }

  test("mixing: sqrt temperature boosts small sources, caps at keep-all") {
    val rows = (0 until 100).map(i => (i.toLong, "small", 1L)) ++
      (100 until 10100).map(i => (i.toLong, "big", 1L))
    val df = rows.toDF("id", "source", "mass")
    val rates = graft.ops.Mixing.sqrtMixRates(df, "source", "mass", budget = 1010L)
      .select($"source", $"rate_ppm").as[(String, Long)].collect().toMap
    assert(rates.values.forall(r => r >= 0L && r <= 1000000L))
    // isqrt shares: small gets 10/110 of 1010 = 91 over mass 100 →
    // 910000 ppm; big gets 918 over 10000 → 91800 ppm
    assert(rates("small") == 910000L && rates("big") == 91800L,
      s"exact integer allocation, got $rates")
    val kept = graft.ops.Mixing.sampleByRatePpm(df, "source", "id",
      graft.ops.Mixing.sqrtMixRates(df, "source", "mass", budget = 1010L))
    val frac = kept.groupBy($"source").count().as[(String, Long)].collect().toMap
    assert(math.abs(frac("small") / 100.0 - 0.91) < 0.15)
    assert(math.abs(frac("big") / 10000.0 - 0.0918) < 0.03)
    // full-budget ⇒ every source caps at keep-all
    val capAll = graft.ops.Mixing
      .sqrtMixRates(df, "source", "mass", budget = 1000000L)
      .select($"rate_ppm").as[Long].collect()
    assert(capAll.forall(_ == 1000000L))
  }

  test("version diff: upsert rewrite yields only truly-changed rows") {
    val tmp = graft.core.TempDirs.create("graft_diffspec_")
    val store = new graft.core.TableStore(spark, tmp, "id")
    val base = (0L until 1000L).map(i => (i, i * 2.0)).toDF("id", "v")
    store.append(base)
    // rewrite 100 rows; the other 900 in the touched files are copied
    // unchanged into new files and must CANCEL in the diff
    store.upsert(base.filter($"id" % 10 === 0).withColumn("v", $"v" + 0.5))
    val Seq(v1, v2) = store.versions.sorted.takeRight(2)
    val (added, removed) = store.diff(v1, v2)
    assert(added.as[(Long, Double)].collect().toSet ==
      (0L until 1000L by 10).map(i => (i, i * 2.0 + 0.5)).toSet)
    assert(removed.as[(Long, Double)].collect().toSet ==
      (0L until 1000L by 10).map(i => (i, i * 2.0)).toSet)
    // reverse direction swaps the roles
    val (radd, rrem) = store.diff(v2, v1)
    assert(radd.count() == 100 && rrem.count() == 100)
  }

  test("overlap matrix: hand-computed shingle jaccard, short rows ignored") {
    val df = Seq(
      ("A", "abcdefgh"),  // shingles: abcde bcdef cdefg defgh
      ("B", "abcdexyzw"), // shingles: abcde bcdex cdexy dexyz exyzw
      ("B", "tiny")       // < k chars: contributes nothing
    ).toDF("src", "text")
    val m = graft.ops.Overlap.shingleOverlapMatrix(df, "src", "text", k = 5)
      .collect()
    assert(m.length == 1)
    val r = m.head
    assert(r.getString(0) == "A" && r.getString(1) == "B")
    assert(r.getLong(2) == 4 && r.getLong(3) == 5 && r.getLong(4) == 1,
      s"expected n_a=4 n_b=5 n_ab=1, got $r")
    assert(r.getDouble(5) == 0.125) // 1 / (4 + 5 - 1)
  }

  test("overlap matrix: hashed path is byte-identical to the exact-string path") {
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .select(col("source"), col("text"))
    val hashed = graft.ops.Overlap.shingleOverlapMatrix(docs, "source", "text")
    val exact = graft.ops.Overlap.shingleOverlapMatrix(docs, "source", "text", exact = true)
    assert(hashed.exceptAll(exact).isEmpty && exact.exceptAll(hashed).isEmpty,
      "hashed shingle overlap diverged from exact strings")
    assert(hashed.count() > 0)
  }

  test("overlap matrix: null groups contribute no pairs, both shapes agree") {
    val df = Seq(
      (Some("A"), "abcdefgh"),
      (Some("B"), "abcdexyzw"),
      (None: Option[String], "abcdefgh") // null source: ingest defect, never a corpus
    ).toDF("src", "text")
    val masked = graft.ops.Overlap.shingleOverlapMatrix(df, "src", "text", k = 5)
    val joined = graft.ops.Overlap.shingleOverlapMatrix(df, "src", "text", k = 5, exact = true)
    assert(masked.exceptAll(joined).isEmpty && joined.exceptAll(masked).isEmpty,
      "mask and join shapes disagree in the presence of a null group")
    val rows = masked.collect()
    assert(rows.length == 1 && rows.head.getString(0) == "A" && rows.head.getString(1) == "B",
      s"null group leaked into the pair matrix: ${rows.mkString(", ")}")
    // the null doc's shingles must not inflate A's count either
    assert(rows.head.getLong(2) == 4, s"n_a inflated by null-group shingles: ${rows.head}")
  }

  test("overlap matrix: supplementary-char group names orient the same in both shapes") {
    // U+E000 (private use) vs U+1D11E (musical G clef): UTF-16
    // code-unit order puts the clef (lead surrogate 0xD834) FIRST,
    // Spark's UTF-8 binary order puts U+E000 (0xEE.. < 0xF0..) first —
    // the exact disagreement that flips (g1, g2) orientation if the
    // mask shape sorts its probe with Java's default String ordering
    val gPrivate = "\uE000src"
    val gClef = new String(Character.toChars(0x1D11E)) + "src"
    assert(gClef < gPrivate && gPrivate.getBytes("UTF-8")(0) == 0xEE.toByte)
    val df = Seq(
      (gPrivate, "abcdefgh"),
      (gClef, "abcdexyzw")
    ).toDF("src", "text")
    val masked = graft.ops.Overlap.shingleOverlapMatrix(df, "src", "text", k = 5)
    val joined = graft.ops.Overlap.shingleOverlapMatrix(df, "src", "text", k = 5, exact = true)
    assert(masked.exceptAll(joined).isEmpty && joined.exceptAll(masked).isEmpty,
      "mask and join shapes disagree on supplementary-char group orientation")
    val r = masked.collect()
    assert(r.length == 1 && r.head.getString(0) == gPrivate,
      s"pair orientation does not follow Spark's UTF-8 binary order: ${r.mkString(", ")}")
  }


  test("overlap matrix: >63 groups takes the join fallback via the capped probe") {
    // 70 groups — the limit-64 probe must route to joinMatrix without
    // ever enumerating all groups on the driver
    val df = (0 until 70).flatMap { g =>
      val Seq(a, b) = f"$g%02d".toSeq // digits interleaved with a fixed
      // letter skeleton: every 5-shingle of this doc carries both
      // digits, so no two groups share any of its shingles
      Seq((f"s$g%02d", "abcdefgh"), (f"s$g%02d", s"x${a}y${b}z${a}w${b}v"))
    }.toDF("src", "text")
    val m = graft.ops.Overlap.shingleOverlapMatrix(df, "src", "text", k = 5)
    // every pair shares the 4 'abcdefgh' shingles: 70*69/2 pairs, n_ab=4
    assert(m.count() == 70L * 69 / 2)
    val r = m.filter(col("g1") === "s00" && col("g2") === "s01").collect().head
    assert(r.getLong(4) == 4, s"shared-shingle intersection wrong: $r")
  }

  test("pagerank: partition-invariant, floor-exact, mass-bounded") {
    val docs = Tables.load(spark, "/root/testdata/sf0.01", "documents")
      .select(col("doc_id"))
    val n = docs.count()
    // star + chain: doc 0 receives a link from everyone (hub); nobody
    // links to doc 1 except the formula chain below
    val edges = docs.select(col("doc_id").as("src"),
        explode(array(lit(1), lit(2))).as("j"))
      .select(col("src"),
        when(col("j") === 1, lit(0L))
          .otherwise((col("src") * 11 + 3) % n).as("dst"))
    val r1 = Graphs.pageRank(docs, "doc_id", edges, "src", "dst", iters = 4)
    val r2 = Graphs.pageRank(docs.repartition(17), "doc_id",
      edges.repartition(13), "src", "dst", iters = 4)
    // integer arithmetic ⇒ bit-identical under any partitioning
    assert(r1.exceptAll(r2).isEmpty && r2.exceptAll(r1).isEmpty,
      "rank_fp must not depend on partitioning")
    val ranks = r1.as[(Long, Long)].collect().toMap
    val hub = ranks(0L)
    assert(hub > ranks.values.sum / n * 5,
      s"hub must dominate, got $hub vs mean ${ranks.values.sum / n}")
    // floor: every rank ≥ (1-d)·1e6; truncation only loses mass
    assert(ranks.values.forall(_ >= 150000L))
    assert(ranks.values.sum <= n * 1000000L,
      "floor-div can only lose mass vs the continuous fixpoint")
  }

  test("merge: matched-update/delete, not-matched-insert, edge cases") {
    val tmp = graft.core.TempDirs.create("graft_mergespec_")
    val store = new graft.core.TableStore(spark, tmp, "id")
    // fresh store: merge == insert
    store.merge(Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
      .toDF("id", "tag", "v"))
    assert(store.read.count() == 3)
    // update 2 (v doubles via t+s), delete 3, insert 4, leave 1 alone
    store.merge(
      Seq((2L, "B", 5.0), (3L, "x", 0.0), (4L, "d", 40.0)).toDF("id", "tag", "v"),
      matchedUpdate = Map(
        "v" -> (col("t.v") + col("s.v")), "tag" -> col("s.tag")),
      matchedDeleteWhen = Some(col("s.tag") === "x"))
    val rows = store.read.orderBy("id").as[(Long, String, Double)].collect().toList
    assert(rows == List((1L, "a", 10.0), (2L, "B", 25.0), (4L, "d", 40.0)))
    // insertNotMatched=false: unmatched source rows vanish
    store.merge(Seq((2L, "z", 1.0), (99L, "n", 9.0)).toDF("id", "tag", "v"),
      matchedUpdate = Map("tag" -> col("s.tag")), insertNotMatched = false)
    val rows2 = store.read.orderBy("id").as[(Long, String, Double)].collect().toList
    assert(rows2 == List((1L, "a", 10.0), (2L, "z", 25.0), (4L, "d", 40.0)))
    // duplicate source keys rejected before anything commits
    val vBefore = store.versions.size
    intercept[IllegalArgumentException] {
      store.merge(Seq((5L, "e", 1.0), (5L, "f", 2.0)).toDF("id", "tag", "v"))
    }
    assert(store.versions.size == vBefore, "failed merge must not commit")
    // the id cannot be assigned
    intercept[IllegalArgumentException] {
      store.merge(Seq((1L, "a", 1.0)).toDF("id", "tag", "v"),
        matchedUpdate = Map("id" -> (col("s.id") + 1)))
    }
  }

  test("shallow clone survives source vacuum of its shared files") {
    val src = new graft.core.TableStore(spark,
      graft.core.TempDirs.create("graft_clonevac_src_"), "id")
    src.append((1L to 500L).map(i => (i, i * 2.0)).toDF("id", "v"))
    val cl = src.cloneTo(graft.core.TempDirs.create("graft_clonevac_dst_") + "/t")
    // source rewrites EVERYTHING (delete half -> survivors into new
    // files) then vacuums with zero grace: the shared originals are
    // dead on the source side and deleted from ITS files/ — the
    // clone's hardlinks must keep the bytes alive
    src.delete(col("id") <= 250)
    src.vacuum(graceMs = 0L)
    assert(src.read.count() == 250)
    assert(cl.read.count() == 500, "clone lost rows after source vacuum")
    assert(cl.read.agg(sum(col("v"))).head.getDouble(0) == (1L to 500L).map(_ * 2.0).sum)
    // clone inherited per-file stats: its id-range scan prunes (smoke:
    // correct values either way, but the readRange path must not throw)
    assert(cl.readRange(1L, 10L).count() == 10)
  }

  test("merge participates in additive schema evolution like append/upsert") {
    val tmp = graft.core.TempDirs.create("graft_mergeevo_")
    val store = new graft.core.TableStore(spark, tmp, "id")
    store.append(Seq((1L, "a"), (2L, "b")).toDF("id", "tag"))
    // source adds a column: matched rows keep it null unless assigned,
    // inserted rows carry it — it must NOT be silently dropped
    store.merge(
      Seq((2L, "B", "new2"), (3L, "c", "new3")).toDF("id", "tag", "extra"),
      matchedUpdate = Map("tag" -> col("s.tag"), "extra" -> col("s.extra")))
    assert(store.read.columns.toSeq == Seq("id", "tag", "extra"),
      s"merge dropped the added column: ${store.read.columns.toSeq}")
    val rows = store.read.orderBy("id")
      .as[(Long, String, Option[String])].collect().toList
    assert(rows == List((1L, "a", None), (2L, "B", Some("new2")),
      (3L, "c", Some("new3"))), s"got $rows")
  }
}
