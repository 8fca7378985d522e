package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** Multinomial NB: hand-computed model values on a two-label fixture,
  * argmax + tie-break semantics, empty-token fallback, parquet model
  * round-trip, and train/test accuracy on the documents fixture's
  * ground-truth language labels.
  */
class NaiveBayesSpec extends AnyFunSuite with Matchers with SparkSpec {

  private def fixture = {
    import spark.implicits._
    Seq(
      (1L, "a", Seq("x", "x", "y")),
      (2L, "a", Seq("x")),
      (3L, "b", Seq("z", "z"))).toDF("id", "label", "toks")
  }

  test("train produces the hand-computed priors, conds, and defaults") {
    val model = NaiveBayes.train(fixture, "label", "toks").collect()
      .map(r => (r.getString(3), r.getString(0), Option(r.getString(1)),
        r.getDouble(2))).toSet
    def l6(x: Double) = math.rint(math.log(x) * 1e6) / 1e6
    // priors: a = 2/3 docs, b = 1/3; V = 3 distinct tokens
    // totals: a = 4 tokens, b = 2
    model should contain(("prior", "a", None, l6(2.0 / 3)))
    model should contain(("prior", "b", None, l6(1.0 / 3)))
    model should contain(("cond", "a", Some("x"), l6(4.0 / 7))) // (3+1)/(4+3)
    model should contain(("cond", "a", Some("y"), l6(2.0 / 7)))
    model should contain(("cond", "b", Some("z"), l6(3.0 / 5))) // (2+1)/(2+3)
    model should contain(("default", "a", None, l6(1.0 / 7)))
    model should contain(("default", "b", None, l6(1.0 / 5)))
    model.count(_._1 == "cond") shouldBe 3 // no cross-label zero rows
  }

  test("classify scores prior + token sums and argmaxes deterministically") {
    import spark.implicits._
    val model = NaiveBayes.train(fixture, "label", "toks")
    val out = NaiveBayes.classify(
        Seq((10L, Seq("x", "y")), (11L, Seq("z")),
          (12L, Seq("unseen")), (13L, Seq.empty[String]))
          .toDF("id", "toks"),
        "id", "toks", model)
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getDouble(2)))
      .toMap
    out(10L)._1 shouldBe "a" // x,y both favor a
    out(11L)._1 shouldBe "b"
    // unseen token: defaults 1/7 (a) vs 1/5 (b); priors 2/3 vs 1/3 —
    // a wins: ln(2/3)+ln(1/7) = -2.351 > ln(1/3)+ln(1/5) = -2.708
    out(12L)._1 shouldBe "a"
    // empty tokens: priors alone -> a
    out(13L) shouldBe (("a", math.rint(math.log(2.0 / 3) * 1e4) / 1e4))
  }

  test("the model is a table: parquet round-trip classifies identically") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-nb-").toString
    NaiveBayes.train(fixture, "label", "toks")
      .write.mode("overwrite").parquet(dir)
    val test = Seq((10L, Seq("x", "z", "y"))).toDF("id", "toks")
    val a = NaiveBayes.classify(test, "id", "toks",
      NaiveBayes.train(fixture, "label", "toks")).collect().map(_.toSeq)
    val b = NaiveBayes.classify(test, "id", "toks",
      spark.read.parquet(dir)).collect().map(_.toSeq)
    a shouldBe b
  }

  test("incremental training is EXACT: batch-by-batch equals the union fit; " +
      "replay and count compaction preserve the model") {
    import spark.implicits._
    val table = java.nio.file.Files
      .createTempDirectory("graft-nbinc").toString + "/counts"
    val b1 = fixture
    val b2 = Seq((4L, "b", Seq("z", "x")), (5L, "c", Seq("q", "q")))
      .toDF("id", "label", "toks")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).toSet

    NaiveBayes.trainIncremental(b1, "label", "toks", table,
      batchId = "b1").count()
    val m2 = rows(NaiveBayes.trainIncremental(b2, "label", "toks", table,
      batchId = "b2"))
    // counting is associative: the incremental model is the union fit,
    // row for row, double for double
    m2 shouldBe rows(NaiveBayes.train(
      b1.unionByName(b2), "label", "toks"))

    // a replayed batch never double-counts its own first attempt
    rows(NaiveBayes.trainIncremental(b2, "label", "toks", table,
      batchId = "b2")) shouldBe m2

    // fold the batch dirs; a third batch still equals the full union
    NaiveBayes.compactCounts(spark, table) should be >= 1
    new java.io.File(table).listFiles()
      .count(_.getName.startsWith("batch=")) shouldBe 1
    val b3 = Seq((6L, "a", Seq("y", "x"))).toDF("id", "label", "toks")
    rows(NaiveBayes.trainIncremental(b3, "label", "toks", table,
      batchId = "b3")) shouldBe
      rows(NaiveBayes.train(b1.unionByName(b2).unionByName(b3),
        "label", "toks"))
  }

  test("a token-free corpus fails loud instead of NULL log-probs") {
    import spark.implicits._
    val docs = Seq((1L, "a", Seq.empty[String]), (2L, "b", Seq.empty[String]))
      .toDF("id", "label", "toks")
    val e = intercept[Exception] {
      NaiveBayes.train(docs, "label", "toks").collect()
    }
    def messages(t: Throwable): String =
      if (t == null) "" else Option(t.getMessage).getOrElse("") + messages(t.getCause)
    messages(e) should include("empty vocabulary")
  }

  test("train/test accuracy on a separable corpus") {
    import spark.implicits._
    // three classes with distinct vocabularies plus shared noise — the
    // testdata documents table is NOT usable here: its lang column is
    // independent of its (shared-vocabulary) text by construction, so
    // no token classifier can beat the prior on it; q123 uses it to
    // oracle-check the COMPUTATION, this test checks LEARNING
    def doc(id: Long): (Long, String, Seq[String]) = {
      val label = (id % 3).toInt
      val own = (0 until 12).map(i => s"w${label}_${(id * 7 + i * 3) % 15}")
      val shared = (0 until 4).map(i => s"s${(id * 11 + i) % 9}")
      (id, s"c$label", own ++ shared)
    }
    val all = (0L until 300L).map(doc).toDF("id", "label", "toks")
    val model = NaiveBayes.train(all.where(col("id") % 3 =!= 1
      || col("id") % 2 === 0), "label", "toks") // ~5/6 of rows
    val test = all.where(col("id") % 3 === 1 && col("id") % 2 === 1)
    val scored = NaiveBayes.classify(test, "id", "toks", model)
      .join(test.select(col("id"), col("label").as("truth")), Seq("id"))
    val (hit, n) = (scored.where(col("label") === col("truth")).count(),
      scored.count())
    n should be > 40L
    val acc = hit.toDouble / n
    withClue(s"accuracy $acc ($hit/$n): ") { acc should be >= 0.95 }
  }

  test("charGrams: hand-computed n-major positional grams; NULL and short edges") {
    import spark.implicits._
    def grams(s: String, minN: Int = 2, maxN: Int = 4): Seq[String] =
      Seq(Tuple1(s)).toDF("t")
        .select(graft.functions.TextFunctions.charGrams(col("t"), minN, maxN))
        .head().getSeq[String](0)
    // whitespace collapses, case folds; order is n-major then position
    grams("AB  cd") shouldBe Seq(
      "ab", "b ", " c", "cd", "ab ", "b c", " cd", "ab c", "b cd")
    grams("x") shouldBe Seq.empty // shorter than minN
    grams("xyz", 3, 4) shouldBe Seq("xyz") // maxN past length: only n=3 fires
    Seq(Tuple1(null: String)).toDF("t")
      .select(graft.functions.TextFunctions.charGrams(col("t")))
      .head().isNullAt(0) shouldBe true
  }

  test("char-gram features classify short unseen-word text where word unigrams can't") {
    import spark.implicits._
    import graft.functions.TextFunctions.charGrams
    // two "languages" with disjoint character stock; train docs are
    // multi-word, the test doc is ONE word never seen in training
    val langA = Seq("kama lako maka", "lama kala mala", "kaka lala mama")
    val langB = Seq("zivi tiri ziti", "riri tizi viti", "zizi riti vivi")
    val train = (langA.map(("a", _)) ++ langB.map(("b", _)))
      .zipWithIndex.map { case ((l, t), i) => (i.toLong, l, t) }
      .toDF("id", "label", "text")
    val test = Seq((100L, "kam"), (101L, "ziv")).toDF("id", "text")

    val wordModel = NaiveBayes.train(
      train.select(col("id"), col("label"),
        graft.functions.TextFunctions.words(col("text")).as("w")), "label", "w")
    val charModel = NaiveBayes.train(
      train.select(col("id"), col("label"),
        charGrams(col("text")).as("g")), "label", "g")

    // word unigrams: "kam"/"ziv" unseen -> both labels fall to their
    // default mass, the decision degenerates to priors (equal here, tie
    // breaks lexicographically to "a" for BOTH docs)
    val byWord = NaiveBayes.classify(
        test.select(col("id"), graft.functions.TextFunctions.words(col("text")).as("w")),
        "id", "w", wordModel)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    byWord(100L) shouldBe "a"
    byWord(101L) shouldBe "a" // the word model CANNOT separate these
    // char grams: "ka"/"am"/"kam" vs "zi"/"iv"/"ziv" carry the signal
    val byChar = NaiveBayes.classify(
        test.select(col("id"), charGrams(col("text")).as("g")), "id", "g", charModel)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    byChar(100L) shouldBe "a"
    byChar(101L) shouldBe "b"
  }

  test("char-gram train/test accuracy on a separable short-text corpus") {
    import spark.implicits._
    import graft.functions.TextFunctions.charGrams
    // character-stock separation instead of vocabulary separation: each
    // doc is a few SHORT words built from its class's letter set — the
    // regime where word unigrams fragment (every doc coins new words)
    def doc(id: Long): (Long, String, String) = {
      val cls = (id % 2).toInt
      val letters = if (cls == 0) "kalm" else "zrtv"
      val text = (0 until 3).map { w =>
        (0 until 4).map(c => letters(((id * 7 + w * 5 + c * 3) % 4).toInt)).mkString
      }.mkString(" ")
      (id, s"c$cls", text)
    }
    val all = (0L until 200L).map(doc).toDF("id", "label", "text")
      .select(col("id"), col("label"), charGrams(col("text")).as("g"))
    val model = NaiveBayes.train(all.where(col("id") % 4 =!= 3), "label", "g")
    val test = all.where(col("id") % 4 === 3)
    val scored = NaiveBayes.classify(test, "id", "g", model)
      .join(test.select(col("id"), col("label").as("truth")), Seq("id"))
    val (hit, n) = (scored.where(col("label") === col("truth")).count(),
      scored.count())
    n shouldBe 50L
    withClue(s"char-gram accuracy $hit/$n: ") { hit shouldBe n }
  }
  test("hashedTokens bounds the model table and matches a manual md5 fold") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a", Seq("alpha", "beta", "alpha")),
      (2L, "b", Seq("gamma", "delta"))).toDF("id", "label", "toks")
    val hashed = docs.select(col("id"), col("label"),
      NaiveBayes.hashedTokens(col("toks"), 8, "s").as("toks"))
    // manual fold: first 8 md5 hex chars of token+salt as u32 / 2^32 * 8
    def bucket(t: String): String = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest((t + "s").getBytes("UTF-8"))
      val hex = d.take(4).map(b => f"${b & 0xFF}%02x").mkString
      math.floor(java.lang.Long.parseLong(hex, 16).toDouble
        / 4294967296.0 * 8).toInt.toString
    }
    val got = hashed.orderBy("id").as[(Long, String, Seq[String])].collect()
    got(0)._3 shouldBe Seq("alpha", "beta", "alpha").map(bucket)
    got(1)._3 shouldBe Seq("gamma", "delta").map(bucket)
    // model bounded at labels x buckets conds (+ 2 rows per label)
    val model = NaiveBayes.train(hashed, "label", "toks")
    model.where(col("kind") === "cond").count() should be <= (2L * 8L)
  }

  test("hashed features keep separable-corpus accuracy when buckets are ample") {
    import spark.implicits._
    def doc(id: Long): (Long, String, Seq[String]) = {
      val label = (id % 3).toInt
      val own = (0 until 12).map(i => s"w${label}_${(id * 7 + i * 3) % 15}")
      val shared = (0 until 4).map(i => s"s${(id * 11 + i) % 9}")
      (id, s"c$label", own ++ shared)
    }
    val all = (0L until 300L).map(doc).toDF("id", "label", "toks")
      .select(col("id"), col("label"),
        NaiveBayes.hashedTokens(col("toks"), 4096, "h").as("toks"))
    val model = NaiveBayes.train(all.where(col("id") % 3 =!= 1
      || col("id") % 2 === 0), "label", "toks")
    val test = all.where(col("id") % 3 === 1 && col("id") % 2 === 1)
    val scored = NaiveBayes.classify(test, "id", "toks", model)
      .join(test.select(col("id"), col("label").as("truth")), Seq("id"))
    val (hit, n) = (scored.where(col("label") === col("truth")).count(),
      scored.count())
    n should be > 40L
    val acc = hit.toDouble / n
    withClue(s"hashed accuracy $acc ($hit/$n): ") { acc should be >= 0.95 }
  }
}
