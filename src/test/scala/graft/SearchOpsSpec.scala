package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.{FuzzyJoin, Similarity, TextSearch}
import graft.core.Tables

/** Specs for the search-family operators: fuzzy (edit-distance) join,
  * BM25 relevance, and product-quantization ANN. */
class SearchOpsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._
  private val sf = "/root/testdata/sf0.001"

  test("fuzzy join finds exactly the brute-force levenshtein pairs") {
    // adversarial mix: exact dup, 1-sub, 2-sub, 1-insert, 2-delete,
    // far strings, and a short string (exercises the length guards)
    val rows = Seq(
      (1L, "abcdefgh"), (2L, "abcdefgh"), (3L, "abcdefgX"),
      (4L, "abXdefgY"), (5L, "abcdefghi"), (6L, "abcdef"),
      (7L, "zzzzzzzz"), (8L, "ab"), (9L, "ba"), (10L, ""))
    val df = rows.toDF("id", "s")
    val got = FuzzyJoin.editDistancePairs(df, "id", "s", k = 2)
      .select("id1", "id2", "dist").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val brute = df.as("a").crossJoin(df.as("b"))
      .filter(col("a.id") < col("b.id"))
      .withColumn("dist", levenshtein(col("a.s"), col("b.s")).cast("long"))
      .filter(col("dist") <= 2)
      .select(col("a.id"), col("b.id"), col("dist")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == brute,
      s"missing=${brute -- got} spurious=${got -- brute}")
    assert(brute.contains((1L, 2L, 0L)) && brute.contains((8L, 9L, 2L)),
      "fixture should exercise dist 0 and transposition-as-2-subs")
  }

  test("fuzzy join equals brute force on 150 random low-alphabet strings") {
    // 3-letter alphabet + short lengths force a dense near-pair graph
    // (substitutions, insertions, deletions, boundary cases all occur);
    // fixed seed keeps the set reproducible
    val rnd = new scala.util.Random(42)
    val rows = (1L to 150L).map { i =>
      val len = 3 + rnd.nextInt(7)
      (i, Array.fill(len)(('a' + rnd.nextInt(3)).toChar).mkString)
    }
    val df = rows.toDF("id", "s")
    val got = FuzzyJoin.editDistancePairs(df, "id", "s", k = 2)
      .select("id1", "id2", "dist").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val brute = df.as("a").crossJoin(df.as("b"))
      .filter(col("a.id") < col("b.id"))
      .withColumn("dist", levenshtein(col("a.s"), col("b.s")).cast("long"))
      .filter(col("dist") <= 2)
      .select(col("a.id"), col("b.id"), col("dist")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(brute.size > 500, s"fixture should be pair-dense, got ${brute.size}")
    assert(got == brute,
      s"missing=${(brute -- got).take(5)} spurious=${(got -- brute).take(5)}")
  }

  test("fuzzy join maxBucket cap drops hot-key candidates only") {
    // 30 identical strings share every deletion key → one hot bucket;
    // capping below 30 removes all their pairs but keeps the disjoint
    // near-pair intact
    val hot = (1L to 30L).map(i => (i, "samesame"))
    val df = (hot ++ Seq((100L, "distinct1"), (101L, "distinct2"))).toDF("id", "s")
    val capped = FuzzyJoin.editDistancePairs(df, "id", "s", k = 1, maxBucket = 10)
      .select("id1", "id2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(capped == Set((100L, 101L)))
  }

  test("bm25 ranks term-dense short docs above sparse long ones") {
    val df = Seq(
      (1L, "table table table scan"),          // dense in query terms
      (2L, "table " + Seq.fill(60)("filler").mkString(" ")), // one hit, long
      (3L, "nothing relevant here at all"),    // zero hits
      (4L, "")).toDF("doc_id", "text")         // empty doc
    val scored = TextSearch.bm25(df, "doc_id", "text", Seq("table", "scan"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(scored(1L) > scored(2L), "dense doc must outrank sparse long doc")
    assert(scored(3L) == 0.0 && scored(4L) == 0.0, "no-hit docs score 0")
    assert(scored(2L) > 0.0)
  }

  test("bm25 matches a direct scala recomputation on real docs") {
    val docs = Tables.load(spark, sf, "documents")
    val terms = Seq("table", "scan")
    val got = TextSearch.bm25(docs, "doc_id", "text", terms)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val raw = docs.select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> Option(r.getString(1)).getOrElse(""))
    val toks = raw.map { case (id, t) =>
      id -> (if (t.trim.isEmpty) Array[String]() else t.trim.toLowerCase.split("\\s+"))
    }.toMap
    val n = toks.size
    val avgdl = toks.values.map(_.length.toLong).sum.toDouble / n
    val dfs = terms.map(tm => tm -> toks.values.count(_.contains(tm))).toMap
    raw.foreach { case (id, _) =>
      val dl = toks(id).length
      val want = terms.map { tm =>
        val tf = toks(id).count(_ == tm).toDouble
        val idf = math.log(1.0 + (n - dfs(tm) + 0.5) / (dfs(tm) + 0.5))
        idf * (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl))
      }.sum
      assert(math.abs(got(id) - want) < 1e-9, s"doc $id: ${got(id)} vs $want")
    }
  }

  test("pq codes are in range and encoding is deterministic") {
    val e = Tables.load(spark, sf, "embeddings")
    val cbs = Similarity.pqTrain(e, "vec_id", "embedding", m = 8, ksub = 16, iters = 2)
    assert(cbs.length == 8 && cbs.forall(_.length == 16) &&
      cbs.forall(_.forall(_.length == 8)))
    val codes = Similarity.pqEncode(e, "vec_id", "embedding", cbs)
    val bad = codes.filter(exists(col("codes"), c => c < 0 || c >= 16)).count()
    assert(bad == 0, "all codes must be in [0, ksub)")
    val c1 = codes.orderBy("item_id").collect().map(_.toString)
    val c2 = Similarity.pqEncode(e, "vec_id", "embedding", cbs)
      .orderBy("item_id").collect().map(_.toString)
    assert(c1.sameElements(c2), "encoding must be deterministic")
  }

  test("pq with a corpus-covering pool equals brute force exactly") {
    // with pool·k >= corpus (500 vectors here, pool 200·3) the ADC
    // cut admits everything, so the exact-cosine re-rank must
    // reproduce brute force row for row — an equality check on the
    // whole candidate/re-rank path. (ADC SELECTIVITY at a real pool
    // fraction is covered by the q_sim_pq gate's recall floor.)
    val e = Tables.load(spark, sf, "embeddings")
    val queries = e.filter(col("vec_id") < 20)
    val cbs = Similarity.pqTrain(e, "vec_id", "embedding", m = 8, ksub = 16, iters = 3)
    val pq = Similarity.pqTopK(e, "vec_id", "embedding",
        queries, "vec_id", "embedding", k = 3, cbs, pool = 200)
      .select("query_id", "item_id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val exact = Similarity.bruteForceTopK(e, "vec_id", "embedding",
        queries, "vec_id", "embedding", k = 3)
      .select("query_id", "item_id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(pq == exact,
      s"missing=${exact -- pq} spurious=${pq -- exact}")
  }
}
