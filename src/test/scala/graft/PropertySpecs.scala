package graft

import org.scalacheck.{Gen, Prop, Properties, Test}
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import graft.functions.TextHash
import graft.ops.TextAnalysis

/** ScalaCheck properties for the load-bearing equivalences. Each case
  * runs one Spark job over a generated batch (not one job per sample),
  * so minSuccessfulTests stays small while string coverage stays wide.
  */
abstract class SparkProperties(name: String) extends Properties(name) {
  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(5)
  protected lazy val spark = SparkTestSession.spark
}

class TextHashProps extends SparkProperties("TextHash") {
  // strings over a alphabet that exercises the tokenizer's edges:
  // whitespace runs, tabs/newlines (btrim strips spaces only), case,
  // punctuation, digits
  private val tokenChars = Gen.oneOf(
    Gen.alphaNumChar, Gen.oneOf(' ', ' ', '\t', '\n', '.', ',', '%', '_'),
    Gen.oneOf('A', 'z', 'ß', 'é'))
  private val textGen: Gen[String] =
    Gen.chooseNum(0, 40).flatMap(n => Gen.listOfN(n, tokenChars).map(_.mkString))
  private val batchGen: Gen[List[String]] = Gen.listOfN(60, textGen)

  property("kernel tokenization == column pipeline (lower/btrim/split)") =
    Prop.forAll(batchGen) { texts =>
      import spark.implicits._
      val fromCols = texts.toDF("t")
        .select(TextAnalysis.tokens(col("t"))).collect()
        .map(_.getSeq[String](0).toList).toList
      val fromKernel = texts.map(s => TextHash.tokenize(UTF8String.fromString(s)).toList)
      fromCols == fromKernel
    }

  property("shingle count == HOF shingle count for any k") =
    Prop.forAll(batchGen, Gen.chooseNum(1, 8)) { (texts, k) =>
      import spark.implicits._
      val rows = texts.toDF("t").select(
        size(graft.functions.TextHashFunctions.shingleHashes(col("t"), k)),
        size(TextAnalysis.shingleFingerprints(col("t"), k))).collect()
      rows.forall(r => r.getInt(0) == r.getInt(1))
    }
}

class CountWindowProps extends SparkProperties("CountWindow") {
  private val dataGen: Gen[List[(Long, Double)]] = for {
    n <- Gen.chooseNum(0, 300)
    ids <- Gen.pick(n, 0L until 1000L)
    vals <- Gen.listOfN(n, Gen.chooseNum(-100, 100).map(_.toDouble))
  } yield ids.toList.zip(vals)

  // n deliberately ranges past rows/shuffle-partitions so bucket
  // auto-shrinking is exercised (a window wider than a bucket would
  // otherwise lose frames spanning 2+ buckets)
  property("bucketed carry-over lowering == one-task sort, any n") =
    Prop.forAll(dataGen, Gen.chooseNum(1, 120)) { (data, n) =>
      import org.apache.spark.sql.expressions.Window
      import spark.implicits._
      val df = data.toDF("id", "v")
      val naiveW = Window.orderBy(col("id")).rowsBetween(-(n - 1), Window.currentRow)
      val naive = df.select(col("id"), sum(col("v")).over(naiveW).as("s"),
          row_number().over(Window.orderBy(col("id"))).as("rn"))
        .filter(col("rn") >= n).drop("rn")
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
      val fast = graft.plan.CountWindow.global(df, "id", n,
          w => Seq(col("id"), sum(col("v")).over(w).as("s")))
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
      naive == fast
    }
}

class NearestCellsProps extends SparkProperties("NearestCells") {
  import graft.functions.VectorSim
  import org.apache.spark.sql.catalyst.util.GenericArrayData

  private val dimGen = Gen.chooseNum(1, 8)
  private def vecGen(d: Int): Gen[Array[Float]] =
    Gen.listOfN(d, Gen.chooseNum(-100, 100).map(_ / 10.0f)).map(_.toArray)

  // reference ranking: cosine against the RAW codebook, stable by cell
  private def naiveRank(v: Array[Float], cb: Array[Array[Double]]): List[Int] = {
    def cos(a: Array[Float], c: Array[Double]): Double = {
      val n = math.min(a.length, c.length)
      var dp = 0.0; var i = 0
      while (i < n) { dp += a(i).toDouble * c(i); i += 1 }
      var na = 0.0; i = 0
      while (i < a.length) { na += a(i).toDouble * a(i).toDouble; i += 1 }
      var nc = 0.0; i = 0
      while (i < c.length) { nc += c(i) * c(i); i += 1 }
      val nn = math.sqrt(na) * math.sqrt(nc)
      if (nn > 0) dp / nn else 0.0
    }
    cb.indices.sortBy(c => (-cos(v, cb(c)), c)).toList
  }

  property("kernel top-n ranking == naive cosine argsort (ties by lower cell)") =
    Prop.forAll(dimGen.flatMap(d =>
      for {
        v <- vecGen(d)
        k <- Gen.chooseNum(1, 6)
        cb <- Gen.listOfN(k, vecGen(d).map(_.map(_.toDouble)))
        n <- Gen.chooseNum(1, k)
      } yield (v, cb.toArray, n))) { case (v, cb, n) =>
      // zero-norm centroids and exact ties are legitimate generator
      // outputs; the kernel resolves ties to the lower cell, so compare
      // against the same rule
      val got = VectorSim.nearestCells(
        new GenericArrayData(v.map(_.asInstanceOf[Any])),
        VectorSim.normalizeCodebook(cb), n).toList
      val want = naiveRank(v, cb).take(n)
      // compare by similarity VALUE, not cell id: distinct cells with
      // equal cosine are interchangeable ranks
      got.length == n && {
        def cosOf(c: Int) = {
          val nd = VectorSim.normalizeCodebook(cb)
          val d = math.min(v.length, nd(c).length)
          (0 until d).map(i => v(i).toDouble * nd(c)(i)).sum
        }
        got.map(cosOf).zip(want.map(cosOf)).forall { case (a, b) => math.abs(a - b) < 1e-9 }
      }
    }
}

/** Remote literal rendering → server-side parse round trip: whatever a
  * client persists must survive `RemoteGraftSession.literal` →
  * `Parser.tokenize`/`InsertParser.parse` without falling through to
  * the delegate parser (the silent-fallthrough failure class found in
  * review: apostrophes, scientific-notation doubles). No Spark session
  * needed — this is the pure wire-format contract. */
class RemoteLiteralProps extends Properties("RemoteLiteral") {
  import graft.sqlparse.InsertParser

  private val anyString: Gen[String] = Gen.chooseNum(0, 30).flatMap(n =>
    Gen.listOfN(n, Gen.oneOf(Gen.alphaNumChar,
      Gen.oneOf('\'', ' ', ',', '(', ')', '.', '-', 'é', '_'))).map(_.mkString))
  private val anyVal: Gen[Any] = Gen.oneOf(
    anyString,
    Gen.chooseNum(Long.MinValue + 1, Long.MaxValue).map(_.asInstanceOf[Any]),
    Gen.chooseNum(-1e12, 1e12).map(_.asInstanceOf[Any]),
    Gen.oneOf(1e-7, 4.9e-324, 1.7e308, -0.0).map(_.asInstanceOf[Any]),
    Gen.const(null))

  property("persist-rendered INSERT re-parses with identical values") =
    Prop.forAll(Gen.listOfN(4, anyVal)) { vals =>
      val rendered = vals.map(v =>
        graft.remote.RemoteGraftSession.literal(v)).mkString(", ")
      InsertParser.parse(s"INSERT INTO t VALUES ($rendered)") match {
        case Some(ins) =>
          ins.rows.head.zip(vals).forall {
            case (None, v) => v == null
            case (Some(s), v: String) => s == v
            case (Some(s), v: Long) => s.toLong == v
            case (Some(s), v: Double) =>
              // plain notation must round-trip the exact double
              s.toDouble == v && !s.toLowerCase.contains("e")
            case _ => false
          }
        case None => false
      }
    }
}
