package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.Conversations

class ConversationsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val wellFormed =
    """[{"role":"user","content":"hi there"},
       {"role":"assistant","content":"hello"},
       {"role":"user","content":"thanks"}]"""

  test("turn extraction explodes well-formed logs and keeps malformed rows visible") {
    val df = Seq(
      (1L, wellFormed),
      (2L, "{not json"),
      (3L, "[]")).toDF("id", "convo")
    val turns = Conversations.extractTurns(df, "convo")
    val byId = turns.collect().groupBy(_.getLong(0))
    assert(byId(1L).length == 3)
    assert(byId(1L).map(r => (r.getInt(2), r.getString(3))).sortBy(_._1).toSeq ==
      Seq((0, "user"), (1, "assistant"), (2, "user")))
    // malformed and empty logs stay visible as a single null-turn row
    assert(byId(2L).length == 1 && byId(2L).head.isNullAt(2))
    assert(byId(3L).length == 1 && byId(3L).head.isNullAt(2))
  }

  test("pairing: trailing user turn and consecutive same-role turns drop") {
    val convo =
      """[{"role":"user","content":"q1"},
         {"role":"user","content":"q1-again"},
         {"role":"assistant","content":"a1"},
         {"role":"assistant","content":"a1-more"},
         {"role":"user","content":"q2-unanswered"}]"""
    val turns = Conversations.extractTurns(Seq((7L, convo)).toDF("id", "convo"), "convo")
    val pairs = Conversations.toPairs(turns, "id").collect()
    // only the user turn immediately before an assistant turn pairs
    assert(pairs.length == 1)
    assert(pairs.head.getString(2) == "q1-again" && pairs.head.getString(3) == "a1")
  }
}
