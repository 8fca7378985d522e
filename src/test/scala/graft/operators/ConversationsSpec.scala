package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** Conversation assembly: recent-suffix truncation under the token
  * budget, deterministic tie-breaks, rendering order, and the
  * oversized-head edge.
  */
class ConversationsSpec extends AnyFunSuite with Matchers with SparkSpec {

  private def turns(rows: (Long, Long, Long, String, String)*) = {
    import spark.implicits._
    rows.toDF("conv", "t", "seq", "role", "content")
  }

  private def assembled(budget: Long,
      rows: (Long, Long, Long, String, String)*) =
    Conversations.assemble(turns(rows: _*), "conv", "t", "seq", "role",
        "content", budget)
      .orderBy(col("conv")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4)))

  test("keeps the maximal recent suffix under the budget and renders " +
      "oldest-kept-first") {
    // tokens: 2, 3, 2, 2 from oldest to newest; budget 5 keeps the
    // last two turns (2+2), the 3-token turn tips it over
    val out = assembled(5L,
      (1L, 10L, 1L, "user", "hello there"),
      (1L, 20L, 2L, "assistant", "general kenobi you are"),
      (1L, 30L, 3L, "user", "fine thanks"),
      (1L, 40L, 4L, "assistant", "great news"))
    out shouldBe Array((1L, 4L, 2L, 4L,
      "user: fine thanks\nassistant: great news"))
  }

  test("a budget covering everything keeps every turn; conversations " +
      "stay independent") {
    val out = assembled(100L,
      (1L, 10L, 1L, "u", "a b"), (1L, 20L, 2L, "a", "c"),
      (2L, 10L, 1L, "u", "x y z"))
    out shouldBe Array(
      (1L, 2L, 2L, 3L, "u: a b\na: c"),
      (2L, 1L, 1L, 3L, "u: x y z"))
  }

  test("an oversized most-recent turn keeps zero turns but surfaces " +
      "the conversation") {
    val out = assembled(3L,
      (1L, 10L, 1L, "u", "small one"),
      (1L, 20L, 2L, "a", "this final turn has six tokens"))
    out shouldBe Array((1L, 2L, 0L, 0L, ""))
  }

  test("timestamp ties break on the sequence column, in both the " +
      "suffix walk and the rendering") {
    // same ts: seq orders them; budget 2 keeps only the highest seq
    val out = assembled(2L,
      (1L, 10L, 1L, "u", "first words"),
      (1L, 10L, 2L, "a", "second words"))
    out shouldBe Array((1L, 2L, 1L, 2L, "a: second words"))
  }

  test("loss-mask spans: offsets index the assembled transcript's " +
      "token stream exactly, train flags follow trainRoles, and the " +
      "budget walk matches assemble") {
    val rows = Seq(
      (1L, 10L, 1L, "user", "hello there friend"),
      (1L, 20L, 2L, "assistant", "general kenobi you are"),
      (1L, 30L, 3L, "user", "fine thanks"),
      (1L, 40L, 4L, "assistant", "great news"),
      (2L, 10L, 1L, "system", "be helpful"),
      (2L, 20L, 2L, "assistant", "ok"))
    val spans = Conversations.lossMaskSpans(turns(rows: _*), "conv",
        "t", "seq", "role", "content", 100L, Seq("assistant"))
      .orderBy(col("conv"), col("turn_no")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getLong(3), r.getLong(4), r.getBoolean(5)))
    // cross-check against the REAL transcripts: slicing the token
    // stream at each span reproduces that turn's rendering
    val transcripts = Conversations.assemble(turns(rows: _*), "conv",
        "t", "seq", "role", "content", 100L)
      .collect().map(r => r.getLong(0) -> r.getString(4)).toMap
    val byConv = rows.groupBy(_._1)
    spans.groupBy(_._1).foreach { case (conv, ss) =>
      val toks = transcripts(conv).split("\\s+").filter(_.nonEmpty)
      ss.foreach { case (_, turnNo, role, start, end, train) =>
        val (_, _, _, r, c) =
          byConv(conv).sortBy(x => (x._2, x._3)).apply(turnNo.toInt)
        r shouldBe role
        toks.slice(start.toInt, end.toInt).mkString(" ") shouldBe s"$role: $c"
        train shouldBe (role == "assistant")
      }
      // spans tile the transcript: contiguous, gap-free, full cover
      ss.sortBy(_._2).sliding(2).foreach {
        case Array(a, b) => b._4 shouldBe a._5
        case _ =>
      }
      ss.map(_._5).max shouldBe toks.length.toLong
      ss.map(_._4).min shouldBe 0L
    }
    // the budget walk is assemble's: a truncated conversation masks
    // only the kept suffix (budget 5 keeps conv 1's last two turns)
    val trunc = Conversations.lossMaskSpans(turns(rows.take(4): _*),
        "conv", "t", "seq", "role", "content", 5L, Seq("assistant"))
      .orderBy(col("turn_no")).collect()
      .map(r => (r.getString(2), r.getLong(3), r.getLong(4), r.getBoolean(5)))
    trunc shouldBe Array(("user", 0L, 3L, false),
      ("assistant", 3L, 6L, true))
    // validation fails loud
    an[IllegalArgumentException] should be thrownBy
      Conversations.lossMaskSpans(turns(rows: _*), "conv", "t", "seq",
        "role", "content", 100L, Nil)
  }
}
