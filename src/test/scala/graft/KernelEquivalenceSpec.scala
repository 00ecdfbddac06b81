package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.TextHashFunctions

/** Locks every round-8 compiled kernel to the HOF / column-expression
  * spelling it replaced, on adversarial generated inputs (unicode,
  * surrogate pairs, whitespace flavors, empties) — the kernels exist
  * for speed, and this spec is what keeps them from silently drifting
  * from the declarative semantics the DuckDB oracles replay. */
class KernelEquivalenceSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // deterministic pseudo-random strings over an adversarial alphabet:
  // ASCII, multi-byte BMP (é, 中), a supplementary pair (𝄞), bullets,
  // whitespace (space/tab/newline), punctuation
  private val alphabet =
    Array("a", "b", "zz", "é", "中", "𝄞", "•", "…", ".", "#",
      " ", "  ", "\t", "\n", "-", "*")
  private def gen(n: Int, seedBase: Int): Seq[String] = {
    val rnd = new scala.util.Random(987654321 + seedBase)
    (1 to n).map { _ =>
      val len = rnd.nextInt(40)
      (1 to len).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
    } ++ Seq("", " ", "   ", "abc", "a b c", "\t\n", "𝄞𝄞𝄞", "ab")
  }

  test("charShingles == transform(sequence, substring), both modes") {
    val df = gen(300, 1).toDF("s")
    for (k <- Seq(1, 3, 5)) {
      val hof = expr(
        s"CASE WHEN length(s) >= $k THEN " +
        s"transform(sequence(1, length(s) - ${k - 1}), i -> substring(s, i, $k)) " +
        s"ELSE cast(array() as array<string>) END")
      val rows = df.select(
        TextHashFunctions.charShingles(col("s"), k, distinct = false).as("kern"),
        hof.as("hof"),
        TextHashFunctions.charShingles(col("s"), k, distinct = true).as("kernD"),
        array_distinct(hof).as("hofD"))
        .as[(Seq[String], Seq[String], Seq[String], Seq[String])].collect()
      rows.foreach { case (a, b, c, d) =>
        assert(a == b, s"k=$k raw shingles diverge: $a vs $b")
        assert(c == d, s"k=$k distinct shingles diverge: $c vs $d")
      }
    }
  }

  test("jaccardDistinct == size(intersect)/size(union) on distinct long sets") {
    val rnd = new scala.util.Random(42)
    val pairs = (1 to 300).map { _ =>
      def set() = (1 to rnd.nextInt(30)).map(_ => rnd.nextInt(25).toLong).distinct
      (set(), set())
    } :+ ((Seq.empty[Long], Seq.empty[Long])) :+ ((Seq(1L), Seq.empty[Long]))
    val df = pairs.toDF("a", "b")
    val rows = df.select(
      TextHashFunctions.jaccardDistinct(col("a"), col("b")).as("kern"),
      when(size(col("a")) === 0 && size(col("b")) === 0, 1.0)
        .otherwise(size(array_intersect(col("a"), col("b"))).cast("double") /
          size(array_union(col("a"), col("b")))).as("hof"))
      .as[(Double, Double)].collect()
    rows.foreach { case (k, h) => assert(k == h, s"jaccard diverges: $k vs $h") }
  }

  test("sigAgree == zip_with equality count") {
    val rnd = new scala.util.Random(7)
    val pairs = (1 to 200).map { _ =>
      val n = rnd.nextInt(65)
      ((1 to n).map(_ => rnd.nextInt(4).toLong),
       (1 to n).map(_ => rnd.nextInt(4).toLong))
    }
    val df = pairs.toDF("a", "b")
    val rows = df.select(
      TextHashFunctions.sigAgree(col("a"), col("b")).as("kern"),
      size(filter(zip_with(col("a"), col("b"), (x, y) => x === y), x => x)).as("hof"))
      .as[(Int, Int)].collect()
    rows.foreach { case (k, h) => assert(k == h, s"sigAgree diverges: $k vs $h") }
  }

  test("tokenWindowLines == per-line transform/slice/array_join") {
    val df = gen(300, 2).toDF("s")
    for (w <- Seq(1, 4, 7)) {
      val toksOnce = when(length(btrim(col("s"))) === 0, array().cast("array<string>"))
        .otherwise(split(btrim(lower(col("s"))), "\\s+"))
      val mkLines = (tk: org.apache.spark.sql.Column) => {
        val nLines = ceil(size(tk) / lit(w.toDouble)).cast("int")
        when(nLines <= 0, array().cast("array<string>"))
          .otherwise(transform(sequence(lit(0), nLines - 1),
            i => array_join(slice(tk, i * w + 1, lit(w)), " ")))
      }
      val hof = get(transform(array(toksOnce), mkLines), lit(0))
      val rows = df.select(
        TextHashFunctions.tokenWindowLines(col("s"), w).as("kern"), hof.as("hof"))
        .as[(Seq[String], Seq[String])].collect()
      rows.foreach { case (k, h) => assert(k == h, s"w=$w lines diverge: $k vs $h") }
    }
  }

  test("deletionNeighborhood == nested substr/concat HOF, k = 1 and 2") {
    val df = gen(200, 3).filter(_.length <= 12).toDF("s")
    def hofKeys(k: Int) = {
      val d0 = "array(s)"
      val d1 =
        """CASE WHEN length(s) >= 1 THEN
             transform(sequence(1, length(s)),
               i -> concat(substr(s, 1, i - 1), substr(s, i + 1, length(s))))
           ELSE array() END"""
      val d2 =
        """CASE WHEN length(s) >= 2 THEN
             flatten(transform(sequence(1, length(s) - 1),
               i -> transform(sequence(i + 1, length(s)),
                 j -> concat(substr(s, 1, i - 1),
                             substr(s, i + 1, j - i - 1),
                             substr(s, j + 1, length(s))))))
           ELSE array() END"""
      val parts = Seq(d0) ++ (if (k >= 1) Seq(d1) else Nil) ++ (if (k >= 2) Seq(d2) else Nil)
      expr(s"array_distinct(concat(${parts.mkString(", ")}))")
    }
    for (k <- Seq(1, 2)) {
      val rows = df.select(
        TextHashFunctions.deletionNeighborhood(col("s"), k).as("kern"),
        hofKeys(k).as("hof"))
        .as[(Seq[String], Seq[String])].collect()
      // sets must agree exactly (emission order differs by design)
      rows.foreach { case (a, b) =>
        assert(a.toSet == b.toSet, s"k=$k neighborhood diverges:\n $a\n $b")
        assert(a.distinct == a, "kernel emitted duplicates")
      }
    }
  }

  test("bandHashes: locality — only the touched band's key changes") {
    val rnd = new scala.util.Random(11)
    val sig = (1 to 64).map(_ => rnd.nextLong())
    val sigs = Seq(("base", sig)) ++ (0 until 16).map { b =>
      (s"mut$b", sig.updated(b * 4 + 1, sig(b * 4 + 1) + 1L))
    }
    val rows = sigs.toDF("name", "sig")
      .select(col("name"),
        TextHashFunctions.bandHashes(col("sig"), 16, 4).as("bh"))
      .as[(String, Seq[Long])].collect().toMap
    val base = rows("base")
    assert(base.length == 16 && base.distinct.length == 16,
      "16 distinct band keys expected")
    for (b <- 0 until 16) {
      val mut = rows(s"mut$b")
      assert(mut(b) != base(b), s"band $b key must change with its slice")
      for (o <- 0 until 16 if o != b)
        assert(mut(o) == base(o), s"band $o key changed when band $b mutated")
    }
    // determinism across evaluation
    val again = Seq(("x", sig)).toDF("name", "sig")
      .select(TextHashFunctions.bandHashes(col("sig"), 16, 4))
      .as[Seq[Long]].head()
    assert(again == base, "band keys must be deterministic")
  }

  test("gopher kernel == the original column formula on generated docs") {
    val docs = gen(250, 4).toDF("text")
    val g = graft.ops.TextAnalysis.gopherRules(col("text"), minWords = 2, maxWords = 10)
    // replicate the pre-kernel column spelling inline
    val toks = when(length(btrim(col("text"))) === 0, array().cast("array<string>"))
      .otherwise(split(btrim(lower(col("text"))), "\\s+"))
    val nWords = size(toks).cast("long")
    val wordChars = aggregate(toks, lit(0L), (acc, w) => acc + length(w))
    val meanWordLen = when(nWords > 0, wordChars.cast("double") / nWords).otherwise(lit(0.0))
    val nHash = length(col("text")) - length(replace(col("text"), lit("#"), lit("")))
    val nEllipsis = (length(col("text")) - length(replace(col("text"), lit("..."), lit("")))) / 3
    val symbolRatio = when(nWords > 0,
      (nHash + nEllipsis).cast("double") / nWords).otherwise(lit(0.0))
    val lines = split(col("text"), "\n")
    val nLines = size(lines).cast("long")
    val bulletLines = size(filter(lines,
      l => substring(ltrim(l), 1, 1).isin("-", "*", "•")))
    val ellipsisLines = size(filter(lines,
      l => rtrim(l).endsWith("...") || rtrim(l).endsWith("…")))
    val alphaWords = size(filter(toks, w => w.rlike("[a-z]")))
    val alphaRatio = when(nWords > 0, alphaWords.cast("double") / nWords).otherwise(lit(0.0))
    val reqStop = Seq("the", "be", "to", "of", "and", "that", "have", "with")
    val nReqStop = size(array_intersect(toks, array(reqStop.map(lit): _*))).cast("long")
    val rows = docs.select(
      g.getField("n_words"), nWords,
      g.getField("mean_word_len"), round(meanWordLen, 4),
      g.getField("n_req_stopwords"), nReqStop,
      g.getField("r_word_count"), nWords >= 2 && nWords <= 10,
      g.getField("r_mean_word_len"), nWords > 0 && meanWordLen >= 3.0 && meanWordLen <= 10.0,
      g.getField("r_symbol_ratio"), nWords > 0 && symbolRatio <= 0.1,
      g.getField("r_bullet_lines"), bulletLines.cast("double") / nLines <= 0.9,
      g.getField("r_ellipsis_lines"), ellipsisLines.cast("double") / nLines <= 0.3,
      g.getField("r_alpha_words"), nWords > 0 && alphaRatio >= 0.8)
      .collect()
    rows.foreach { r =>
      var i = 0
      while (i < r.length) {
        assert(r.get(i) == r.get(i + 1),
          s"gopher field ${i / 2} diverges: ${r.get(i)} vs ${r.get(i + 1)} (row $r)")
        i += 2
      }
    }
  }

  test("DHash64: codegen column path == interpreted eval, incl. nulls") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.{BinaryType, LongType, StructField, StructType}
    import org.apache.spark.sql.{Encoders, Row}
    import graft.functions.{DHash64, ImageHashFunctions}
    val payloads: Seq[Array[Byte]] =
      (0L until 12L).map(s =>
        graft.ops.Multimodal.renderTileImage(30 + s.toInt, 24, "png", s)) ++
      (0L until 4L).map(s =>
        graft.ops.Multimodal.renderTileImage(24, 30 + s.toInt, "jpeg", 100L + s)) ++
      Seq(null, Array.empty[Byte], Array[Byte](9, 9, 9), "plaintext".getBytes("UTF-8"))
    val schema = StructType(Seq(StructField("payload", BinaryType)))
    implicit val enc = Encoders.row(schema)
    val javaRows = new java.util.ArrayList[Row]()
    payloads.foreach(p => javaRows.add(Row(p)))
    // repartition keeps it off the LocalRelation constant-fold path so
    // the projection actually runs through whole-stage codegen
    val df = spark.createDataFrame(javaRows, schema).repartition(4)
    val viaColumn = df.select(ImageHashFunctions.dhash64(col("payload")).as("h"))
      .collect().map(r => if (r.isNullAt(0)) null else java.lang.Long.valueOf(r.getLong(0)))
    val viaInterp = payloads.map(p =>
      DHash64(Literal(p, BinaryType)).eval(null).asInstanceOf[java.lang.Long])
    assert(viaColumn.filter(_ == null).length == viaInterp.filter(_ == null).length,
      "null counts diverge between codegen and interpreted dHash")
    assert(viaColumn.filter(_ != null).map(_.longValue).sorted.toSeq ==
      viaInterp.filter(_ != null).map(_.longValue).sorted.toSeq,
      "dHash values diverge between codegen and interpreted paths")
  }

  test("AudioFp64 / VideoDHash64: codegen column path == interpreted eval, incl. nulls") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.{BinaryType, StructField, StructType}
    import org.apache.spark.sql.{Encoders, Row}
    import graft.functions.{AudioFp64, MediaHashFunctions, VideoDHash64}
    val audio: Seq[Array[Byte]] =
      (0L until 8L).map(s => graft.ops.Multimodal.renderWalkWav(25 + s.toInt, 8000, s)) ++
      Seq(null, Array.empty[Byte], Array[Byte](9, 9, 9),
        graft.ops.Multimodal.renderWav(32, 8000, 1L)) // too short → null
    val video: Seq[Array[Byte]] =
      (0L until 4L).map(s => graft.ops.Multimodal.renderAvi(3, 32, 24, 40000, s)) ++
      Seq(null, Array.empty[Byte], "plaintext".getBytes("UTF-8"))
    def check(payloads: Seq[Array[Byte]], viaCol: org.apache.spark.sql.Column => org.apache.spark.sql.Column,
              interp: Array[Byte] => java.lang.Long, what: String): Unit = {
      val schema = StructType(Seq(StructField("payload", BinaryType)))
      implicit val enc = Encoders.row(schema)
      val javaRows = new java.util.ArrayList[Row]()
      payloads.foreach(p => javaRows.add(Row(p)))
      val df = spark.createDataFrame(javaRows, schema).repartition(4)
      val viaColumn = df.select(viaCol(col("payload")).as("h"))
        .collect().map(r => if (r.isNullAt(0)) null else java.lang.Long.valueOf(r.getLong(0)))
      val viaInterp = payloads.map(interp)
      assert(viaColumn.count(_ == null) == viaInterp.count(_ == null),
        s"$what: null counts diverge between codegen and interpreted")
      assert(viaColumn.filter(_ != null).map(_.longValue).sorted.toSeq ==
        viaInterp.filter(_ != null).map(_.longValue).sorted.toSeq,
        s"$what: values diverge between codegen and interpreted paths")
    }
    check(audio, MediaHashFunctions.audioFp64,
      p => AudioFp64(Literal(p, BinaryType)).eval(null).asInstanceOf[java.lang.Long], "AudioFp64")
    check(video, MediaHashFunctions.videoDHash64,
      p => VideoDHash64(Literal(p, BinaryType)).eval(null).asInstanceOf[java.lang.Long], "VideoDHash64")
  }
}
