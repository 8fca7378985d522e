package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** Deflate compression-ratio quality signal: executor output must match
  * a driver-side java.util.zip reference byte for byte (same JVM zlib),
  * the ratio must order repetitive < prose < random as the heuristic
  * requires, and the plan must stay map-only.
  */
class CompressionSpec extends AnyFunSuite with Matchers with SparkSpec {

  private def deflateLen(s: String, level: Int): Long = {
    val d = new java.util.zip.Deflater(level, true)
    try {
      val bytes = s.getBytes("UTF-8")
      d.setInput(bytes); d.finish()
      val buf = new Array[Byte](8192)
      var total = 0L
      while (!d.finished()) total += d.deflate(buf)
      total
    } finally d.end()
  }

  private val prose = "The quick brown fox jumps over the lazy dog while " +
    "seventeen sailors argue about the weather in a small harbor tavern. " +
    "Nobody remembers who ordered the second round, but the barkeep " +
    "wrote it on a slate beside the door. Outside, gulls worked the " +
    "tide line and a ferry horn sounded twice across the grey water. " +
    "By morning the argument had moved on to navigation, as it always " +
    "does when the charts are older than the youngest deckhand aboard."
  private val spam = Seq.fill(60)("buy cheap now").mkString(" ")
  // seeded printable-ASCII noise: ~6.5 bits/char entropy, so deflate
  // cannot get near prose's ratio (hex/base64 would — smaller alphabets
  // compress below English even at full entropy)
  private val noise = {
    val rnd = new scala.util.Random(42)
    Array.fill(600)(rnd.nextPrintableChar()).mkString
  }

  test("executor stats equal the driver-side java.util.zip reference") {
    import spark.implicits._
    val docs = Seq((1L, prose), (2L, spam), (3L, noise),
      (4L, "x"), (5L, "ünïcödé — non-ASCII bytes count in UTF-8"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.compressionSignal(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    docs.collect().foreach { r =>
      val (id, t) = (r.getLong(0), r.getString(1))
      out(id) shouldBe (t.getBytes("UTF-8").length.toLong, deflateLen(t, 6))
    }
  }

  test("ratio orders repetitive < prose < random noise; empty and null " +
      "texts drop") {
    import spark.implicits._
    val docs = Seq((1L, prose), (2L, spam), (3L, noise), (4L, ""),
      (5L, null: String)).toDF("doc_id", "text")
    val r = TextAnalysis.compressionSignal(docs, "doc_id", "text")
      .collect().map(x => x.getLong(0) -> x.getDouble(3)).toMap
    r.keySet shouldBe Set(1L, 2L, 3L)
    r(2L) should be < r(1L) // template spam compresses too well
    r(1L) should be < r(3L) // noise barely compresses
    r.values.foreach(v => v should (be > 0.0 and be < 2.0))
  }

  test("a non-default level changes the byte count but keeps parity") {
    import spark.implicits._
    val docs = Seq((1L, prose + " " + spam)).toDF("doc_id", "text")
    val out = TextAnalysis.compressionSignal(docs, "doc_id", "text",
      level = 1).collect()(0)
    out.getLong(2) shouldBe deflateLen(prose + " " + spam, 1)
  }

  test("the signal plans map-only: no exchange anywhere") {
    import spark.implicits._
    val plan = TextAnalysis.compressionSignal(
        Seq((1L, prose)).toDF("doc_id", "text"), "doc_id", "text")
      .queryExecution.executedPlan.toString
    plan should not include "Exchange"
  }

  test("deflate_ratio_in matches the struct-field predicate row for row") {
    import spark.implicits._
    val docs = Seq((1L, prose), (2L, spam), (3L, noise), (4L, ""),
      (5L, null: String), (6L, "x"), (7L, prose + spam)).toDF("doc_id", "text")
    val (lo, hi) = (0.35, 0.95)
    val st = graft.functions.GraftFunctions.deflate_stats(col("text"))
    val structKeep = st.getField("raw_bytes") === 0L ||
      (st.getField("deflate_bytes") >= lit(lo) * st.getField("raw_bytes") &&
        st.getField("deflate_bytes") <= lit(hi) * st.getField("raw_bytes"))
    val viaStruct = docs.where(structKeep).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    val viaGate = docs.where(graft.functions.GraftFunctions
        .deflate_ratio_in(col("text"), lo, hi)).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    viaGate shouldBe viaStruct
    viaGate should contain(4L) // empty text passes (no bytes to judge)
    viaGate should not contain 5L // null text drops (null-false predicate)
  }

  test("the gate plans as ONE expression in the filter (single deflate " +
      "per row) and stays map-only") {
    import spark.implicits._
    // RDD-backed input: a local Seq would fold into LocalTableScan at
    // optimization time and erase the filter from the plan entirely
    val docs = spark.sparkContext.parallelize(Seq((1L, prose)))
      .toDF("doc_id", "text")
    val plan = docs.where(graft.functions.GraftFunctions
        .deflate_ratio_in(col("text"), 0.3, 0.9))
      .queryExecution.executedPlan.toString
    plan should not include "Exchange"
    // exactly one deflate call site in the physical predicate — the
    // struct-field form inlines deflate_stats once per field reference
    "deflate".r.findAllIn(plan.toLowerCase).size shouldBe 1
    // and the struct-field form really does replicate the deflate —
    // the 3x-per-row hazard the gate expression exists to avoid
    val st = graft.functions.GraftFunctions.deflate_stats(col("text"))
    val structPlan = docs.where(st.getField("raw_bytes") === 0L ||
        (st.getField("deflate_bytes") >= lit(0.3) * st.getField("raw_bytes") &&
          st.getField("deflate_bytes") <= lit(0.9) * st.getField("raw_bytes")))
      .queryExecution.executedPlan.toString
    "deflate".r.findAllIn(structPlan.toLowerCase).size should be > 1
  }

  test("knob validation fails loud") {
    import spark.implicits._
    val docs = Seq((1L, prose)).toDF("doc_id", "text")
    an[Exception] should be thrownBy
      TextAnalysis.compressionSignal(docs, "doc_id", "text", level = 0)
        .collect()
  }
}
