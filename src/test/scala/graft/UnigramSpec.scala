package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.{Bpe, Unigram}

/** Unigram-LM tokenizer properties beyond the gate's cross-path
  * identity: losslessness, alphabet coverage, partition invariance,
  * and that hard-EM actually learns frequent multi-char pieces. */
class UnigramSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def corpus = Seq(
    "the quick brown fox jumps over the lazy dog",
    "the quick brown fox likes the other fox",
    "pack my box with five dozen liquor jugs",
    "the jugs fox dog quick quick the the").toDF("text")

  test("learn: vocab capped, alphabet present, frequent words become pieces") {
    val words = Bpe.wordFreq(corpus, "text").select(col("word"), col("wcount"))
    val vocab = Unigram.learn(words, vocabSize = 64, iters = 3,
      seedSize = 256, maxPieceLen = 6)
    val pieces = vocab.map(_.piece).toSet
    // every corpus character must be a piece (coverage guarantee)
    val alphabet = corpus.as[String].collect().flatMap(_.split("\\s+"))
      .flatMap(_.toCharArray).map(_.toString).toSet
    assert(alphabet.subsetOf(pieces),
      s"missing alphabet pieces: ${alphabet -- pieces}")
    // 'the' (8 occurrences) must be learned as one piece
    assert(pieces.contains("the"), "frequent word 'the' not learned")
    // log-probs normalized over positive counts
    assert(vocab.forall(p => p.count >= 1 && p.logp < 0.0))
  }

  test("learn: bit-identical to referenceLearn and partition-invariant") {
    val words = Bpe.wordFreq(corpus, "text").select(col("word"), col("wcount"))
    val v1 = Unigram.learn(words, vocabSize = 48, iters = 2,
      seedSize = 200, maxPieceLen = 5)
    val v2 = Unigram.learn(words.repartition(7), vocabSize = 48, iters = 2,
      seedSize = 200, maxPieceLen = 5)
    assert(v1 == v2, "fit must not depend on partitioning")
    val dict = words.collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val ref = Unigram.referenceLearn(dict, vocabSize = 48, iters = 2,
      seedSize = 200, maxPieceLen = 5)
    assert(v1 == ref, s"diverges from reference:\n  ${v1.take(3)}\n  ${ref.take(3)}")
  }

  test("segmentWord: losslessness and longer-piece tie-break") {
    val lp = Map("ab" -> math.log(0.25), "a" -> math.log(0.5),
      "b" -> math.log(0.5), "c" -> math.log(0.25))
    // score("ab") = ln(.25); score("a")+score("b") = ln(.25) — equal:
    // the LONGER piece must win the tie
    assert(Unigram.segmentWord("ab", lp, 6) == Seq("ab"))
    assert(Unigram.segmentWord("abc", lp, 6).mkString("") == "abc")
    // unknown characters consume one code point at the floor
    assert(Unigram.segmentWord("axb", lp, 6) == Seq("a", "x", "b"))
    assert(Unigram.segmentWord("", lp, 6).isEmpty)
  }
}
