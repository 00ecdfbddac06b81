package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.functions.{TextHash, TextHashFunctions, VectorFunctions}
import graft.ops.TextAnalysis

class NativeExprSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._
  private val sf = "/root/testdata/sf0.001"

  test("native shingle hashes agree with the HOF pipeline on set structure") {
    val docs = Tables.load(spark, sf, "documents").limit(200)
    val both = docs.select(
      size(TextHashFunctions.shingleHashes(col("text"), 5)).as("n_native"),
      size(array_distinct(TextHashFunctions.shingleHashes(col("text"), 5))).as("d_native"),
      size(TextAnalysis.shingleFingerprints(col("text"), 5)).as("n_hof"),
      size(array_distinct(TextAnalysis.shingleFingerprints(col("text"), 5))).as("d_hof"))
      .collect()
    // same tokenization ⇒ same shingle count; same distinct count means
    // the kernel's hash is injective wherever xxhash64 was
    both.foreach { r =>
      assert(r.getInt(0) == r.getInt(2), "shingle count mismatch")
      assert(r.getInt(1) == r.getInt(3), "distinct shingle count mismatch")
    }
  }

  test("native text stats match the column-expression pipeline") {
    val stop = Seq("the", "a", "and", "of", "to")
    val extra = Seq("", "   ", "the the THE a.b,c!", "one", "tab\ttokens here .")
      .toDF("text")
    val docs = Tables.load(spark, sf, "documents").select("text")
      .limit(200).unionByName(extra)
    val st = graft.functions.TextStatsFunctions.textStats(col("text"), stop)
    val rows = docs.select(
      st.getField("n_chars"), length(col("text")).cast("long"),
      st.getField("n_tokens"), TextAnalysis.tokenCount(col("text")).cast("long"),
      st.getField("n_punct"), length(regexp_replace(col("text"), "[^.,!?;:]", "")).cast("long"),
      st.getField("n_stop"),
      size(filter(TextAnalysis.tokens(col("text")), w => w.isin(stop.map(s => s: Any): _*))).cast("long"),
      st.getField("n_stop_distinct"),
      size(array_intersect(TextAnalysis.tokens(col("text")), typedlit(stop))).cast("long"))
      .collect()
    rows.foreach { r =>
      assert(r.getLong(0) == r.getLong(1), "n_chars")
      assert(r.getLong(2) == r.getLong(3), "n_tokens")
      assert(r.getLong(4) == r.getLong(5), "n_punct")
      assert(r.getLong(6) == r.getLong(7), "n_stop")
      assert(r.getLong(8) == r.getLong(9), "n_stop_distinct")
    }
  }

  test("native expressions stay inside whole-stage codegen") {
    val docs = Tables.load(spark, sf, "documents")
    val plan = docs.select(
      TextHashFunctions.minhashSignature(col("text"), 5, 64).as("sig"),
      TextHashFunctions.simhash(col("text")).as("sh"))
      .queryExecution.executedPlan
    val s = plan.toString
    assert(!s.contains("BatchEvalPython") && !s.toLowerCase.contains("scalaudf"))
    assert(plan.find(_.getClass.getSimpleName.contains("WholeStageCodegen")).isDefined,
      s"expected a WholeStageCodegen span:\n$s")
  }

  test("BoW score/buckets: codegen column path equals the kernel directly, in codegen") {
    val dims = 64
    val w = Array.tabulate(dims)(i => (i * 7 - 200).toLong)
    val cases = Seq("", "  ", "one", "a b  c", "UPPER case repeated case")
    val df = cases.toDF("t")
    // the codegen-span check needs a file-backed scan (a LocalRelation
    // constant-folds away before codegen)
    val filePlan = Tables.load(spark, sf, "documents")
      .select(TextHashFunctions.bowScore(col("text"), dims, w, 11L))
      .queryExecution.executedPlan
    assert(filePlan.find(_.getClass.getSimpleName.contains("WholeStageCodegen")).isDefined,
      s"expected a WholeStageCodegen span:\n$filePlan")
    val q = df.select(
      TextHashFunctions.bowScore(col("t"), dims, w, 11L).as("s"),
      TextHashFunctions.bowBuckets(col("t"), dims).as("b"))
    val got = q.collect()
    cases.zip(got).foreach { case (s, r) =>
      val u = org.apache.spark.unsafe.types.UTF8String.fromString(s)
      assert(r.getLong(0) == TextHash.bowScore(u, dims, w, 11L), s"score for '$s'")
      val kb = TextHash.tokenize(u).filter(_.nonEmpty).map(TextHash.bucket(_, dims)).toList
      assert(r.getSeq[Int](1).toList == kb, s"buckets for '$s'")
    }
  }

  test("compress sizes: codegen column path equals the kernel, stays in codegen") {
    val cases = Seq("", "x", "abab" * 50, "the quick brown fox")
    val df = cases.toDF("t")
    val filePlan = Tables.load(spark, sf, "documents")
      .select(graft.functions.CompressFunctions.compressSizes(col("text")))
      .queryExecution.executedPlan
    assert(filePlan.find(_.getClass.getSimpleName.contains("WholeStageCodegen")).isDefined,
      s"expected a WholeStageCodegen span:\n$filePlan")
    val q = df.select(graft.functions.CompressFunctions.compressSizes(col("t")).as("cz"))
    val got = q.select(col("cz.raw_bytes"), col("cz.deflate_bytes")).collect()
    cases.zip(got).foreach { case (s, r) =>
      val k = graft.functions.CompressionKernel.sizes(
        org.apache.spark.unsafe.types.UTF8String.fromString(s))
      assert(r.getLong(0) == k.getLong(0) && r.getLong(1) == k.getLong(1),
        s"sizes for '${s.take(10)}'")
    }
  }

  test("native cosine matches a manual computation and the kernel directly") {
    val df = Seq((Array(1.0f, 0.0f), Array(1.0f, 1.0f))).toDF("a", "b")
    val got = df.select(VectorFunctions.cosine(col("a"), col("b"))).head.getDouble(0)
    assert(math.abs(got - 1.0 / math.sqrt(2)) < 1e-12)
  }

  test("kernel tokenization matches the column pipeline on edge cases") {
    val cases = Seq("", "  ", "one", "a b  c", " padded ", "tab\tsep", "UPPER Case")
    val df = cases.toDF("t")
    val fromCols = df.select(TextAnalysis.tokens(col("t"))).collect()
      .map(_.getSeq[String](0).toList)
    val fromKernel = cases.map(s =>
      TextHash.tokenize(org.apache.spark.unsafe.types.UTF8String.fromString(s)).toList)
    assert(fromCols.toList == fromKernel.toList)
  }

  test("simhash: near-identical docs are closer than unrelated docs") {
    def h(s: String) = TextHash.simhash(org.apache.spark.unsafe.types.UTF8String.fromString(s))
    val a = h("spark is a unified analytics engine for large scale data processing")
    val b = h("spark is a unified analytics engine for large scale data processing today")
    val c = h("completely different words about cooking pasta with tomato sauce")
    def ham(x: Long, y: Long) = java.lang.Long.bitCount(x ^ y)
    assert(ham(a, b) < ham(a, c))
  }
}
