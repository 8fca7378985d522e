package graft.pipelines

import org.apache.spark.sql.functions.{col, regexp_extract}
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** The optional cleaning gates compose without disturbing the oracle-pinned
  * default pipeline: repetition (2b) and decontamination (4b) each drop
  * exactly their planted offenders, and defaults leave the q45 semantics
  * untouched (same survivors as the all-defaults call).
  */
class TrainingDataSpec extends AnyFunSuite with Matchers with SparkSpec {

  // English-markered docs that pass the lang+quality gates
  private def goodDoc(tail: String) =
    "the data of a table is the thing to scan and filter and sort " + tail

  test("repetition and decontamination gates drop exactly the planted offenders") {
    import spark.implicits._
    val docs = Seq(
      (1L, goodDoc("with joins and windows over rows and groups here")),
      // looping doc: passes diversity coarsely but bigram-repeats heavily
      (2L, goodDoc("spam ham spam ham spam ham spam ham spam ham spam ham spam ham spam ham")),
      (3L, goodDoc("plus aggregates and buckets and ranges in the plan"))
    ).toDF("doc_id", "text")
    val probes = Seq(
      // contained verbatim in doc 3's text
      (900L, "aggregates and buckets and ranges")
    ).toDF("doc_id", "text")

    val defaults = TrainingData.clean(docs, "doc_id", "text",
        cacheIntermediate = false)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    defaults shouldBe Set(1L, 2L, 3L)

    val repGated = TrainingData.clean(docs, "doc_id", "text",
        cacheIntermediate = false, maxDupGramFrac = 0.2)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    repGated shouldBe Set(1L, 3L) // the looping doc fails the 2b gate

    val decontaminated = TrainingData.clean(docs, "doc_id", "text",
        cacheIntermediate = false, maxDupGramFrac = 0.2,
        decontaminateProbes = Some(probes))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    decontaminated shouldBe Set(1L) // doc 3 contains the benchmark item
  }

  test("blocklist gate (stage 0a) runs before dedup: a blocked keeper " +
      "does not shadow its clean near-duplicate") {
    import spark.implicits._
    val docs = Seq(
      // doc 1 hits the blocklist; doc 2 is its near-dup with smaller-id 1
      // as the would-be keeper — gating FIRST must let doc 2 survive
      (1L, goodDoc("plus aggregates and buckets with the bad phrase inside")),
      (2L, goodDoc("plus aggregates and buckets with a clean sentence inside")),
      (3L, goodDoc("where filters and sorts and limits shape the result"))
    ).toDF("doc_id", "text")
    val cleaned = TrainingData.clean(docs, "doc_id", "text",
        cacheIntermediate = false,
        blocklistPhrases = Seq("bad phrase"))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    cleaned shouldBe Set(2L, 3L)
    // without the blocklist, the smaller id keeps and the near-dup drops
    TrainingData.clean(docs, "doc_id", "text", cacheIntermediate = false)
      .select("doc_id").collect().map(_.getLong(0)).toSet shouldBe
      Set(1L, 3L)
  }

  test("html extraction (stage 0-pre) feeds gates the main text only: " +
      "boilerplate never reaches survivors, chrome-only pages drop") {
    import spark.implicits._
    def page(body: String) =
      "<html><head><script>var BAD_JS=1;</script></head><body>" +
        "<nav><a href='/'>NAVCHROME</a></nav>" +
        s"<p>$body</p>" +
        "<footer>FOOTERCHROME</footer></body></html>"
    val docs = Seq(
      (1L, page(goodDoc("with joins and windows over rows and groups here"))),
      (2L, page(goodDoc("plus aggregates and buckets and ranges in the plan"))),
      // chrome-only page: no article block survives extraction
      (3L, "<html><body><nav><a href='/'>NAVCHROME</a></nav>" +
        "<footer>FOOTERCHROME</footer></body></html>")
    ).toDF("doc_id", "html")
    val cleaned = TrainingData.clean(docs, "doc_id", "text",
      cacheIntermediate = false, htmlCol = Some("html"))
    cleaned.select("doc_id").collect().map(_.getLong(0)).toSet shouldBe
      Set(1L, 2L)
    // survivors' token accounting reflects the EXTRACTED text, and the
    // survivors match cleaning the pre-extracted bodies directly
    val direct = TrainingData.clean(
        Seq((1L, goodDoc("with joins and windows over rows and groups here")),
          (2L, goodDoc("plus aggregates and buckets and ranges in the plan")))
          .toDF("doc_id", "text"),
        "doc_id", "text", cacheIntermediate = false)
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    cleaned.orderBy("doc_id").collect().map(_.toSeq).toSeq shouldBe direct
  }

  test("the optional gopher gate drops rule-failing docs early with " +
      "lineage attribution; defaults leave the pipeline untouched") {
    import spark.implicits._
    // long enough to clear the 50-word floor, distinct tails so the
    // near-dup stage keeps both
    def longDoc(tail: String) =
      (goodDoc("with joins and windows over rows and groups " + tail) +
        " ") * 4
    val docs = Seq(
      (1L, longDoc("alpha beta gamma delta epsilon zeta eta theta")),
      (2L, longDoc("iota kappa lambda mu nu xi omicron pi rho sigma")),
      // short doc: passes lang/quality but fails the 50-word floor
      (3L, goodDoc("with short tail here"))
    ).toDF("doc_id", "text")
    val rec = TrainingData.lineageRecorder("doc_id")
    TrainingData.clean(docs, "doc_id", "text",
        cacheIntermediate = false, gopherGate = true,
        lineage = Some(rec))
      .select("doc_id").collect().map(_.getLong(0)).toSet shouldBe
      Set(1L, 2L)
    rec.frame(spark).where(col("stage") === "gopher")
      .collect().map(r => (r.getLong(0), r.getString(2))) shouldBe
      Array((3L, "gopher_rules_fail"))
    // gate off: doc 3 survives (it passes the default lang/quality)
    TrainingData.clean(docs, "doc_id", "text", cacheIntermediate = false)
      .select("doc_id").collect().map(_.getLong(0)).toSet shouldBe
      Set(1L, 2L, 3L)
  }

  test("the optional compression gate (stage 0a3) drops the " +
      "too-compressible template doc with lineage attribution") {
    import spark.implicits._
    def longDoc(tail: String) =
      (goodDoc("with joins and windows over rows and groups " + tail) +
        " ") * 4
    val docs = Seq(
      (1L, longDoc("alpha beta gamma delta epsilon zeta eta theta")),
      (2L, longDoc("iota kappa lambda mu nu xi omicron pi rho sigma")),
      // template spam: one 3-word phrase repeated — deflate crushes it
      // far below prose's ratio even though it clears lang/quality
      (3L, Seq.fill(80)("the best price").mkString(" "))
    ).toDF("doc_id", "text")
    // measure the fixture's actual ratios, then thread a threshold
    // between spam and prose — never knife-edge on either
    val sig = graft.operators.TextAnalysis.compressionSignal(
        docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    sig(3L) should be < sig(1L)
    val lo = (sig(3L) + sig(1L).min(sig(2L))) / 2
    val rec = TrainingData.lineageRecorder("doc_id")
    TrainingData.clean(docs, "doc_id", "text",
        cacheIntermediate = false,
        compressionRatioBounds = Some((lo, 1.5)),
        lineage = Some(rec))
      .select("doc_id").collect().map(_.getLong(0)).toSet shouldBe
      Set(1L, 2L)
    rec.frame(spark).where(col("stage") === "compression")
      .collect().map(_.getLong(0)) shouldBe Array(3L)
    // gate off: the near-dup stage is what it falls to — it survives
    // there (no >= threshold partner) and quality keeps it too
    TrainingData.clean(docs, "doc_id", "text", cacheIntermediate = false)
      .select("doc_id").collect().map(_.getLong(0)).toSet shouldBe
      Set(1L, 2L, 3L)
  }

  test("the optional encoding stage repairs mojibake BEFORE dedup and " +
      "scoring, and drops control-junk docs with lineage attribution") {
    import spark.implicits._
    import java.nio.charset.StandardCharsets.{ISO_8859_1, UTF_8}
    def l1(x: String) = new String(x.getBytes(UTF_8), ISO_8859_1)
    val accented = goodDoc("at the café with naïve résumé rows here")
    val docs = Seq(
      (1L, accented),
      (2L, l1(accented)), // mojibake twin — repairs to doc 1's text
      (3L, goodDoc("plus aggregates and buckets and ranges in the plan")),
      (4L, "\u0001\u0002\u0003\u0004 the") // mostly control junk
    ).toDF("doc_id", "text")
    val rec = TrainingData.lineageRecorder("doc_id")
    val survivors = TrainingData.clean(docs, "doc_id", "text",
        cacheIntermediate = false, fixEncoding = true,
        lineage = Some(rec))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    survivors shouldBe Set(1L, 3L)
    val byId = rec.frame(spark).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getString(2))).toMap
    // the repaired twin is byte-identical to doc 1 → exact dedup takes
    // it (proof the repair runs BEFORE dedup, not just before scoring)
    byId(2L)._1 shouldBe "exact_dedup"
    byId(4L) shouldBe ("encoding", "control_frac>0.2")
    (survivors ++ byId.keys) shouldBe Set(1L, 2L, 3L, 4L) // partition
    // stage off: the twin is NOT byte-identical — it falls only to the
    // (much more expensive) near-dup stage, and the junk doc reaches
    // the language gate instead of dropping at encoding
    val recOff = TrainingData.lineageRecorder("doc_id")
    TrainingData.clean(docs, "doc_id", "text",
      cacheIntermediate = false, lineage = Some(recOff))
    val offById = recOff.frame(spark).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    offById(2L) shouldBe "near_dup"
    offById.get(4L) should not be Some("encoding")
  }

  test("the optional C4 line stage rewrites docs to their rule-passing " +
      "lines and drops brace/lorem docs with lineage attribution") {
    import spark.implicits._
    val good = goodDoc("with joins and windows over rows and groups here.")
    val docs = Seq(
      // junk lines removed, the good line survives → doc passes gates
      (1L, Seq("menu", good, "enable javascript please.").mkString("\n")),
      // distinct bodies (no near-dup coupling with doc 1)
      (2L, goodDoc("where filters and sorts and limits shape results.") +
        "\nlorem ipsum dolor sit amet."), // doc-level drop
      (3L, goodDoc("when groups and ranges and rollups cover the frame.") +
        "\nif (x) { return; }"),          // doc-level drop
      (4L, goodDoc("plus aggregates and buckets and ranges in the plan."))
    ).toDF("doc_id", "text")
    val rec = TrainingData.lineageRecorder("doc_id")
    val out = TrainingData.clean(docs, "doc_id", "text",
      cacheIntermediate = false, c4MinLineWords = Some(3),
      lineage = Some(rec))
    val rows = out.collect().map(r =>
      r.getAs[Long]("doc_id") -> r.getAs[Long]("ws_tokens")).toMap
    rows.keySet shouldBe Set(1L, 4L)
    // doc 1's surviving text is ONLY the good line (junk lines removed
    // before tokenization — ws_tokens counts the rewritten text)
    rows(1L) shouldBe good.split("\\s+").length.toLong
    val byId = rec.frame(spark).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getString(2))).toMap
    byId(2L) shouldBe ("c4_doc", "contains_lorem_ipsum")
    byId(3L) shouldBe ("c4_doc", "contains_brace")
    (rows.keySet ++ byId.keys) shouldBe Set(1L, 2L, 3L, 4L)
    // stage off: every doc reaches the normal gates (braces and lorem
    // are prose-legal there)
    TrainingData.clean(docs, "doc_id", "text", cacheIntermediate = false)
      .select("doc_id").collect().map(_.getLong(0)).toSet shouldBe
      Set(1L, 2L, 3L, 4L)
  }

  test("crawl end-to-end: WARC files -> responses -> clean(htmlCol) " +
      "equals cleaning the same pages directly") {
    import spark.implicits._
    def page(body: String) =
      "<html><head><script>var BAD_JS=1;</script></head><body>" +
        "<nav><a href='/'>NAVCHROME</a></nav>" +
        s"<p>$body</p>" +
        "<footer>FOOTERCHROME</footer></body></html>"
    val pages = Seq(
      1L -> page(goodDoc("with joins and windows over rows and groups here")),
      2L -> page(goodDoc("plus aggregates and buckets and ranges in the plan")),
      3L -> "<html><body><nav><a href='/'>NAVCHROME</a></nav></body></html>")
    val crlf = "\r\n"
    def rec(id: Long, html: String): String = {
      val http = s"HTTP/1.1 200 OK${crlf}Content-Type: text/html$crlf$crlf$html"
      s"WARC/1.0${crlf}WARC-Type: response$crlf" +
        s"WARC-Target-URI: http://ex.org/doc/$id$crlf" +
        s"Content-Length: ${http.getBytes("UTF-8").length}$crlf$crlf" +
        http + crlf + crlf
    }
    val files = Seq((0L, pages.map((rec _).tupled).mkString))
      .toDF("file_id", "content")
    val bodies = graft.operators.Warc
      .responses(files, "file_id", "content")
      .select(regexp_extract(col("url"), "/doc/(\\d+)$", 1)
        .cast("long").as("doc_id"), col("body"))
    val viaCrawl = TrainingData.clean(bodies, "doc_id", "text",
        cacheIntermediate = false, htmlCol = Some("body"))
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    val direct = TrainingData.clean(pages.toDF("doc_id", "html"),
        "doc_id", "text", cacheIntermediate = false,
        htmlCol = Some("html"))
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    viaCrawl shouldBe direct
    viaCrawl.map(_.head) shouldBe Seq(1L, 2L) // the chrome-only page fell
  }

  test("drop-reason lineage partitions the input exactly once across " +
      "gate combinations, with first-fail stage attribution") {
    import spark.implicits._
    val docs = Seq(
      (1L, goodDoc("with joins and windows over rows and groups here")),
      (2L, goodDoc("with joins and windows over rows and groups here")), // exact dup of 1
      (3L, ""), // no tokens
      (4L, "der hund und die katze und der vogel und das haus und der baum ist nicht da"), // german
      (5L, goodDoc("x") + " zz qq " * 1), // short → low quality? may pass; harmless either way
      (6L, goodDoc("plus aggregates and buckets and ranges in the plan")),
      (7L, goodDoc("plus aggregates and buckets and ranges in the plan extra")), // near dup of 6
      (8L, goodDoc("spam ham spam ham spam ham spam ham spam ham spam ham spam ham spam ham")), // repetitive
      (9L, goodDoc("where the bad phrase filters and sorts shape the result"))
    ).toDF("doc_id", "text")
    val probes = Seq((900L, "aggregates and buckets and ranges"))
      .toDF("doc_id", "text")

    def check(gates: (String, Option[TrainingData.LineageRecorder] =>
        org.apache.spark.sql.DataFrame)*): Unit = gates.foreach {
      case (label, run) =>
        val rec = TrainingData.lineageRecorder("doc_id")
        val survivors = run(Some(rec))
          .select("doc_id").collect().map(_.getLong(0)).toSet
        val lineage = rec.frame(spark).collect()
          .map(r => r.getLong(0) -> (r.getString(1), r.getString(2)))
        val droppedIds = lineage.map(_._1)
        withClue(s"$label: ") {
          droppedIds.distinct.length shouldBe droppedIds.length // once each
          (survivors ++ droppedIds) shouldBe (1L to 9L).toSet // partition
          survivors.intersect(droppedIds.toSet) shouldBe empty
        }
    }

    check(
      "defaults" -> (rec => TrainingData.clean(docs, "doc_id", "text",
        cacheIntermediate = false, lineage = rec)),
      "blocklist+repetition+decontaminate" -> (rec =>
        TrainingData.clean(docs, "doc_id", "text",
          cacheIntermediate = false, maxDupGramFrac = 0.2,
          blocklistPhrases = Seq("bad phrase"),
          decontaminateProbes = Some(probes), lineage = rec)))

    // stage attribution on the default run: first-failing gate wins
    val rec = TrainingData.lineageRecorder("doc_id")
    TrainingData.clean(docs, "doc_id", "text",
      cacheIntermediate = false, lineage = Some(rec))
    val byId = rec.frame(spark).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getString(2))).toMap
    byId(2L) shouldBe ("exact_dedup", "duplicate_text")
    byId(3L) shouldBe ("tokenize", "no_tokens")
    byId(4L) shouldBe ("language", "lang=de")
    byId(7L) shouldBe ("near_dup", "near_dup_of=6")
    // lineage off: clean() returns the identical survivor frame
    val plain = TrainingData.clean(docs, "doc_id", "text",
        cacheIntermediate = false)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    plain shouldBe ((1L to 9L).toSet -- byId.keySet)
  }

  test("domain gate (stage 0) drops blocked and over-cap domains before dedup") {
    import spark.implicits._
    val docs = Seq(
      (1L, goodDoc("with joins and windows over rows and groups here"),
        "https://keep.example.com/1"),
      (2L, goodDoc("plus aggregates and buckets and ranges in the plan"),
        "https://keep.example.com/2"),
      (3L, goodDoc("where filters and sorts and limits shape the result"),
        "https://keep.example.com/3"),
      (4L, goodDoc("and shuffles and exchanges move the rows between maps"),
        "https://spam.example.org/x")
    ).toDF("doc_id", "text", "url")

    // blocklist kills doc 4's domain; cap=2 keeps docs 1-2 of keep.example.com
    val gated = TrainingData.clean(docs, "doc_id", "text",
        cacheIntermediate = false, urlCol = Some("url"),
        domainBlocklist = Seq("example.org"), maxPerDomain = 2L)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    gated shouldBe Set(1L, 2L)

    // stage 0 composes: equals the pipeline run on the pre-gated input
    val pre = graft.operators.Urls.domainGate(docs, "url", "doc_id",
      Seq("example.org"), 2L)
    val viaOperator = TrainingData.clean(pre, "doc_id", "text",
        cacheIntermediate = false)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    viaOperator shouldBe gated

    // and with no url column the pipeline is untouched
    val all = TrainingData.clean(docs.drop("url"), "doc_id", "text",
        cacheIntermediate = false)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    all shouldBe Set(1L, 2L, 3L, 4L)
  }

  test("robots gate (stage 0-rb) drops disallowed fetches before the " +
      "domain cap, with lineage; hosts without robots pass") {
    import spark.implicits._
    val docs = Seq(
      // doc 1: the domain's MIN id, but robots-disallowed
      (1L, goodDoc("with joins and windows over rows and groups here"),
        "https://a.example.com/private/1"),
      (2L, goodDoc("plus aggregates and buckets and ranges in the plan"),
        "https://a.example.com/public/2"),
      (3L, goodDoc("where filters and sorts and limits shape the result"),
        "https://b.example.com/private/3") // no robots row -> allowed
    ).toDF("doc_id", "text", "url")
    val robots = Seq(("a.example.com",
      "User-agent: *\nDisallow: /private/")).toDF("host", "body")

    val rec = TrainingData.lineageRecorder("doc_id")
    val out = TrainingData.clean(docs, "doc_id", "text",
        cacheIntermediate = false, urlCol = Some("url"),
        robotsTable = Some(robots), lineage = Some(rec))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    out shouldBe Set(2L, 3L)
    val drops = rec.frame(spark)
      .where(col("stage") === "robots")
      .select("doc_id", "reason").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    drops.toSeq shouldBe Seq(1L -> "robots_disallowed")

    // a robots-blocked doc consumes NO domain-cap budget: both hosts
    // share the REGISTERED domain example.com, so cap=1 admits exactly
    // one doc — and it must be doc 2, the min id among fetchable docs
    // (were the cap applied first, it would spend the budget on the
    // disallowed doc 1 and the domain would ship nothing)
    TrainingData.clean(docs, "doc_id", "text",
        cacheIntermediate = false, urlCol = Some("url"),
        robotsTable = Some(robots), maxPerDomain = 1L)
      .select("doc_id").collect().map(_.getLong(0)).toSet shouldBe
      Set(2L)
    // robotsTable without urlCol fails loud
    intercept[IllegalArgumentException] {
      TrainingData.clean(docs, "doc_id", "text",
        robotsTable = Some(robots))
    }
  }

  test("url dedup (stage 0b) collapses crawl-noise refetches of one page") {
    import spark.implicits._
    val docs = Seq(
      // three fetches of ONE page: fragment / utm noise / host case —
      // texts differ (dynamic content), so TEXT dedup alone keeps all
      (1L, goodDoc("with joins and windows over rows and groups here"),
        "https://site.example.com/page?id=7"),
      (2L, goodDoc("plus aggregates and buckets and ranges in the plan"),
        "https://site.example.com/page?id=7&utm_source=feed"),
      (3L, goodDoc("where filters and sorts and limits shape the result"),
        "https://SITE.example.com/page?id=7#part2"),
      (4L, goodDoc("and shuffles and exchanges move the rows between maps"),
        "https://site.example.com/other"),
      (5L, goodDoc("then sketches and samples summarize the stream cheaply"),
        null)
    ).toDF("doc_id", "text", "url")

    val kept = TrainingData.clean(docs, "doc_id", "text",
        cacheIntermediate = false, urlCol = Some("url"), dedupByUrl = true)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    // min id wins the canonical-URL group; null-url doc passes through
    kept shouldBe Set(1L, 4L, 5L)

    an[IllegalArgumentException] should be thrownBy
      TrainingData.clean(docs, "doc_id", "text", dedupByUrl = true)
  }

  test("model language gate (2a') overrides the heuristic when provided") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // both docs share the English-markered prefix (identical heuristic
    // and quality treatment); the model is trained so the TAIL
    // vocabulary decides the language — the shared prefix cancels
    val prefix = Seq("the", "data", "of", "a", "table", "is", "the",
      "thing", "to", "scan", "and", "filter", "and", "sort")
    val train = (1 to 40).map { i =>
      if (i % 2 == 0)
        (i.toLong, "en", prefix ++ Seq("joins", "windows", "rows",
          "groups", s"t${i % 5}"))
      else
        (i.toLong, "xx", prefix ++ Seq("zork", "blar", "quux",
          "flib", s"t${i % 5}"))
    }.toDF("id", "label", "toks")
    val model = graft.operators.NaiveBayes.train(train, "label", "toks")

    val docs = Seq(
      (1L, goodDoc("with joins and windows over rows and groups here")),
      (2L, goodDoc("with zork and blar over quux and flib and zork here")))
      .toDF("doc_id", "text")

    // heuristic: both pass (same markers, same quality)
    TrainingData.clean(docs, "doc_id", "text", cacheIntermediate = false)
      .select("doc_id").collect().map(_.getLong(0)).toSet shouldBe
      Set(1L, 2L)
    // model gate: the xx-vocabulary doc drops
    TrainingData.clean(docs, "doc_id", "text", cacheIntermediate = false,
        langModel = Some(model))
      .select("doc_id").collect().map(_.getLong(0)).toSet shouldBe Set(1L)
    // and gating to the OTHER language keeps exactly the complement
    TrainingData.clean(docs, "doc_id", "text", cacheIntermediate = false,
        lang = "xx", langModel = Some(model))
      .select("doc_id").collect().map(_.getLong(0)).toSet shouldBe Set(2L)
  }

  test("model language gate scores char grams when langModelCharGrams is set") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    import graft.functions.TextFunctions.charGrams
    // model TRAINED on char 2-4-grams (the fastText posture) — the gate
    // must tokenize the same way or every doc scores on default mass;
    // tail character stock separates, shared prefix cancels
    val prefix = goodDoc("")
    val train = (1 to 40).map { i =>
      if (i % 2 == 0) (i.toLong, "en", prefix + "joins windows rows groups")
      else (i.toLong, "xx", prefix + "zork blar quux flib")
    }.toDF("id", "label", "text")
      .select(col("id"), col("label"), charGrams(col("text")).as("g"))
    val model = graft.operators.NaiveBayes.train(train, "label", "g")

    val docs = Seq(
      (1L, goodDoc("with joins and windows over rows and groups here")),
      (2L, goodDoc("with zork and blar over quux and flib and zork here")))
      .toDF("doc_id", "text")
    TrainingData.clean(docs, "doc_id", "text", cacheIntermediate = false,
        langModel = Some(model), langModelCharGrams = Some((2, 4)))
      .select("doc_id").collect().map(_.getLong(0)).toSet shouldBe Set(1L)
    TrainingData.clean(docs, "doc_id", "text", cacheIntermediate = false,
        lang = "xx", langModel = Some(model), langModelCharGrams = Some((2, 4)))
      .select("doc_id").collect().map(_.getLong(0)).toSet shouldBe Set(2L)
  }

  test("span-strip stage (1b) removes the shared boilerplate before accounting") {
    import spark.implicits._
    // an 8-word boilerplate header shared verbatim by two docs whose bodies
    // are unique (no other shared 8-token window): k=8 marks exactly the
    // boiler's tokens as the one duplicated span in each
    val boiler = "this code is licensed under the apache terms"
    val docs = Seq(
      (1L, s"$boiler the data of a table is the thing to scan and filter and sort with joins here"),
      (2L, s"$boiler a query of rows is the part to group and join and order with windows here")
    ).toDF("doc_id", "text")

    val plain = TrainingData.clean(docs, "doc_id", "text",
        cacheIntermediate = false)
      .select("doc_id", "n_words").as[(Long, Long)].collect().toMap
    val stripped = TrainingData.clean(docs, "doc_id", "text",
        cacheIntermediate = false, stripSpansK = Some(8))
      .select("doc_id", "n_words").as[(Long, Long)].collect().toMap

    plain.keySet shouldBe Set(1L, 2L)
    stripped.keySet shouldBe Set(1L, 2L) // survivors unchanged, text shrunk
    stripped(1L) shouldBe plain(1L) - 8
    stripped(2L) shouldBe plain(2L) - 8
  }

  test("defaults reproduce the q45 pipeline on the fixture") {
    val docs = graft.core.Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val viaDefaults = TrainingData.clean(docs, "doc_id", "text")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    // disabled gates are plan no-ops: identical survivor set
    val viaDisabled = TrainingData.clean(docs, "doc_id", "text",
        maxDupGramFrac = 1.0, decontaminateProbes = None, maxLmBits = None)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    viaDisabled shouldBe viaDefaults
    viaDefaults should not be empty
  }

  test("perplexity gate (4c) drops the statistical outlier, keeps prose") {
    import spark.implicits._
    // distinct tails keep all 13 docs through exact dedup; the outlier's
    // bigrams occur nowhere else. Threshold derived from the measured
    // scores (midpoint), so the test pins the ORDERING the gate relies
    // on, not a magic constant.
    val docs = (1L to 12L).map(i =>
      (i, goodDoc(s"with joins and windows over rows and groups number $i"))) :+
      (50L, goodDoc("zq xv qj vx jz xq zj vq qx jv zx vj qz xj"))
    val df = docs.toDF("doc_id", "text")
    val bits = graft.operators.NgramLm.selfScoreBits(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val proseMax = (bits - 50L).values.max
    bits(50L) should be > proseMax
    val thr = (bits(50L) + proseMax) / 2
    val all = TrainingData.clean(df, "doc_id", "text",
        cacheIntermediate = false, nearDupThreshold = 1.01)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    all should contain(50L)
    val gated = TrainingData.clean(df, "doc_id", "text",
        cacheIntermediate = false, nearDupThreshold = 1.01,
        maxLmBits = Some(thr))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    (all -- gated) shouldBe Set(50L) // exactly the outlier drops
  }

  test("perplexity gate scores against a reference corpus when given") {
    import spark.implicits._
    val reference = (1L to 10L).map(i =>
      (i, goodDoc("with joins and windows over rows and groups here")))
      .toDF("doc_id", "text")
    val docs = Seq(
      (1L, goodDoc("with joins and windows over rows and groups here")),
      (2L, goodDoc("zq xv qj vx jz xq zj vq qx jv zx vj qz xj"))
    ).toDF("doc_id", "text")
    val model = graft.operators.NgramLm.train(reference, "text")
    val vocab = graft.operators.NgramLm.vocabSize(reference, "text")
    val bits = graft.operators.NgramLm
      .scoreBits(docs, "doc_id", "text", model, vocab)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    bits(2L) should be > bits(1L) // off-reference text IS more surprising
    val thr = (bits(1L) + bits(2L)) / 2
    val gated = TrainingData.clean(docs, "doc_id", "text",
        cacheIntermediate = false, nearDupThreshold = 1.01,
        maxLmBits = Some(thr), lmReference = Some(reference))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    gated shouldBe Set(1L) // in-distribution passes, off-reference drops
  }

  test("perplexity gate at lmOrder=3 uses the backoff trigram scorer") {
    import spark.implicits._
    val reference = (1L to 10L).map(i =>
      (i, goodDoc("with joins and windows over rows and groups here")))
      .toDF("doc_id", "text")
    val docs = Seq(
      (1L, goodDoc("with joins and windows over rows and groups here")),
      (2L, goodDoc("zq xv qj vx jz xq zj vq qx jv zx vj qz xj"))
    ).toDF("doc_id", "text")
    val bits = graft.operators.NgramLm.scoreBitsTrigram(docs, "doc_id",
        "text", graft.operators.NgramLm.trainTrigram(reference, "text"),
        graft.operators.NgramLm.vocabSize(reference, "text"))
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    bits(2L) should be > bits(1L)
    val thr = (bits(1L) + bits(2L)) / 2
    val gated = TrainingData.clean(docs, "doc_id", "text",
        cacheIntermediate = false, nearDupThreshold = 1.01,
        maxLmBits = Some(thr), lmReference = Some(reference), lmOrder = 3)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    gated shouldBe Set(1L) // the trigram gate reproduces the split
    an[IllegalArgumentException] should be thrownBy
      TrainingData.clean(docs, "doc_id", "text", lmOrder = 4)
  }

  test("adaptive quality floor (3b) equals the operator applied to the gated set") {
    import org.apache.spark.sql.functions.{col, lit}
    val docs = graft.core.Tables.load(spark, "/root/testdata/sf0.001", "documents")
    def survivors(q: Option[Double]): Set[Long] =
      TrainingData.clean(docs, "doc_id", "text",
        cacheIntermediate = false, nearDupThreshold = 1.01,
        minQualityQuantile = q)
        .select("doc_id").collect().map(_.getLong(0)).toSet
    val base = survivors(None)
    val floored = survivors(Some(0.5))
    floored.subsetOf(base) shouldBe true
    floored should not be empty

    // tie-robust expectation: re-score the base survivors with the same
    // quality expression and apply the operator directly — the pipeline
    // wiring must agree exactly, ties included
    val scored = graft.operators.TextAnalysis
      .quality(docs, "doc_id", "text")
      .where(col("doc_id").isin(base.toSeq: _*))
      .withColumn("g", lit("one"))
    val expected = graft.operators.Profile
      .groupQuantileFloor(scored, "g", "quality", 0.5)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    floored shouldBe expected
  }
  test("DSIR gate (4d) keeps target-like survivors and floors the rest") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // both docs pass lang/quality; doc 2's tail vocabulary is disjoint
    // from the target's, doc 1's matches it
    val docs = Seq(
      (1L, goodDoc("with joins and windows over rows and groups here")),
      (2L, goodDoc("zzz qqq xxx jjj kkk zzz qqq xxx jjj kkk zzz qqq"))
    ).toDF("doc_id", "text")
    val target = Seq(
      (100L, goodDoc("with joins and windows and groups and rows here")),
      (101L, goodDoc("joins over rows and windows and groups again"))
    ).toDF("doc_id", "text")

    // defaults: both survive (the gate is off)
    TrainingData.clean(docs, "doc_id", "text", cacheIntermediate = false)
      .select("doc_id").collect().map(_.getLong(0)).toSet shouldBe Set(1L, 2L)

    // gated: the off-target doc's weight is negative (its features sit in
    // raw-only buckets), the target-like doc's is not
    val gated = TrainingData.clean(docs, "doc_id", "text",
        cacheIntermediate = false, dsirTarget = Some(target))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    gated shouldBe Set(1L)

    // the gate replays the operator: survivors == importanceWeights >= 0
    // over the same (lmGated) input
    val expected = graft.operators.Dsir.importanceWeights(
        docs, target, "doc_id", "text", 1024, salt = "dsir")
      .where(col("logw") >= 0.0)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    gated shouldBe expected

    // spilled and unspilled plans agree
    val spilled = TrainingData.clean(docs, "doc_id", "text",
        cacheIntermediate = true, dsirTarget = Some(target))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    spilled shouldBe gated
  }
}
