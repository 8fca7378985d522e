package graft.serving

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.concurrent.Eventually
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers
import org.scalatest.time.{Seconds, Span}

import graft.SparkSpec
import graft.operators.{LexicalIndex, Similarity}

/** Interactive retrieval over maintained indexes — the reference's
  * query-continuously-maintained-state posture
  * (`services/PurchasesService.java:58-94`) extended to the search
  * family: stream documents INTO a positional lexical index via
  * [[LexicalIndex.maintain]], build an IVF ANN index beside it, then GET
  * the `/search` endpoints and assert exact JSON bodies (the
  * `HttpApiSpec` discipline).
  */
class RetrievalHttpSpec extends AnyFunSuite with Matchers with Eventually
    with SparkSpec {

  private val client = HttpClient.newHttpClient()

  private def get(addr: String, path: String): (Int, String) = {
    val res = client.send(
      HttpRequest.newBuilder(URI.create(s"http://$addr$path")).GET().build(),
      HttpResponse.BodyHandlers.ofString())
    (res.statusCode(), res.body())
  }

  test("bm25, phrase and hybrid search serve a streamed-into index " +
      "with exact JSON bodies") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._

    // corpus with a hand-checkable ranking: for "alpha", doc 1 (tf 2)
    // outranks doc 2 (tf 1); "beta beta" occurs twice in doc 3 only
    val dir = graft.io.Spill.tempDir("graft-http-idx-")
    val lexDir = s"$dir/lex"
    LexicalIndex.write(
      Seq(1L -> "alpha beta alpha", 2L -> "alpha gamma").toDF("doc_id", "text"),
      "doc_id", "text", lexDir, nBuckets = 8, positional = true)
    // docs 3 and 4 arrive through the streaming maintainer
    val input = MemoryStream[(Long, String)]
    val query = LexicalIndex.maintain(spark, lexDir,
      input.toDF().toDF("doc_id", "text"), "doc_id", "text", checkpoint())
    input.addData(Seq(3L -> "beta beta beta", 4L -> "delta epsilon"))
    query.processAllAvailable()
    query.stop()

    // dense side: cosines to [1, 0] are doc1 1.0 > doc2 0.8 > doc3 0 > doc4 -1
    val annDir = s"$dir/ann"
    Similarity.writeIvfIndex(
      Seq(1L -> Array(1.0, 0.0), 2L -> Array(0.8, 0.6),
        3L -> Array(0.0, 1.0), 4L -> Array(-1.0, 0.0))
        .toDF("vec_id", "embedding"),
      "vec_id", "embedding", annDir, nList = 2)

    // the corpus parquet beside the indexes: passage snippets slice
    // text from it, facets join the lang attribute from it
    val docsDir = s"$dir/docs"
    Seq((1L, "alpha beta alpha", "en"), (2L, "alpha gamma", "en"),
        (3L, "beta beta beta", "fr"), (4L, "delta epsilon", null))
      .toDF("doc_id", "text", "lang")
      .write.mode("overwrite").parquet(docsDir)

    val api = new HttpApi(new Serving)
      .retrieval(HttpApi.Retrieval(spark,
        lexicalIndexPath = Some(lexDir), annIndexPath = Some(annDir),
        docsPath = Some(docsDir)))
      .start()
    try {
      // lexical: tf 2 in the shorter-normalized doc wins; the streamed
      // doc 3 holds no "alpha"
      get(api.address, "/search/bm25/alpha") shouldBe
        (200, """[{"rank":1,"doc_id":1},{"rank":2,"doc_id":2}]""")
      // phrase adjacency over the STREAMED doc, self-overlap counted
      get(api.address, "/search/phrase/beta%20beta") shouldBe
        (200, """[{"rank":1,"doc_id":3,"n_hits":2}]""")
      // hybrid RRF: doc 1 leads both lists, doc 2 is second in both,
      // doc 3 only dense (rank 3)
      get(api.address, "/search/hybrid/alpha?vec=1.0,0.0&k=3") shouldBe
        (200, """[{"rank":1,"doc_id":1},{"rank":2,"doc_id":2},{"rank":3,"doc_id":3}]""")
      // k override truncates
      get(api.address, "/search/bm25/alpha?k=1") shouldBe
        (200, """[{"rank":1,"doc_id":1}]""")
      // proximity: only doc 1 holds alpha AND beta within a word
      // (min span 1: alpha@0, beta@1); no doc pairs beta with gamma
      get(api.address, "/search/near/alpha%20beta?slop=1") shouldBe
        (200, """[{"rank":1,"doc_id":1,"span":1}]""")
      get(api.address, "/search/near/beta%20gamma") shouldBe (200, "[]")
      // malformed slop is a caller error
      get(api.address, "/search/near/alpha%20beta?slop=wide")._1 shouldBe 400
      // passage: doc 1 "alpha beta alpha" packs 3 hits from start 0;
      // doc 2 has one alpha, doc 3's beta run scores 3 as well but
      // ranks after doc 1 on the ascending-doc tiebreak. With the
      // corpus configured each row quotes its winning window (doc 2's
      // snippet clamps at its 2-word tail)
      get(api.address, "/search/passage/alpha%20beta?window=3") shouldBe
        (200, """[{"rank":1,"doc_id":1,"n_hits":3,"start":0,"snippet":"alpha beta alpha"},""" +
          """{"rank":2,"doc_id":3,"n_hits":3,"start":0,"snippet":"beta beta beta"},""" +
          """{"rank":3,"doc_id":2,"n_hits":1,"start":0,"snippet":"alpha gamma"}]""")
      get(api.address, "/search/passage/alpha?window=bad")._1 shouldBe 400
      // highlighting wraps matched terms only (presentation on the k
      // collected rows, never in the plan)
      get(api.address,
        "/search/passage/alpha%20beta?window=3&highlight=1&k=1") shouldBe
        (200, """[{"rank":1,"doc_id":1,"n_hits":3,"start":0,""" +
          """"snippet":"[alpha] [beta] [alpha]"}]""")
      // fuzzy: "alhpa" (transposition = dist 2? no — one substitution
      // pair at dist 2; use "alpa", one delete from alpha) expands to
      // the vocabulary term and ranks like the exact query
      get(api.address, "/search/fuzzy/alpa") shouldBe
        (200, """[{"rank":1,"doc_id":1},{"rank":2,"doc_id":2}]""")
      // a term expanding to nothing contributes nothing
      get(api.address, "/search/fuzzy/zzzzzz") shouldBe (200, "[]")
      // facets: alpha|beta matches docs 1,2 (en) and 3 (fr) — biggest
      // slice first; delta matches only the unlabeled doc 4
      get(api.address, "/search/facets/alpha%20beta") shouldBe
        (200, """[{"facet":"en","n_docs":2},{"facet":"fr","n_docs":1}]""")
      get(api.address, "/search/facets/delta") shouldBe
        (200, """[{"facet":null,"n_docs":1}]""")
      // boolean: requiring alpha keeps the alpha-bearing docs 1 and 2
      // (the streamed doc 3's betas never rank), banning alpha flips
      // to doc 3 ("%2B" is "+")
      get(api.address, "/search/bool/beta%20%2Balpha") shouldBe
        (200, """[{"rank":1,"doc_id":1},{"rank":2,"doc_id":2}]""")
      get(api.address, "/search/bool/beta%20-alpha") shouldBe
        (200, """[{"rank":1,"doc_id":3}]""")
      // an all-negative expression has nothing to rank
      get(api.address, "/search/bool/-alpha")._1 shouldBe 400
      // significant terms: the corpus is tiny so just pin the shape —
      // alpha's match set (docs 1,2) over-represents gamma (1/2
      // matched vs 1/4 corpus) and beta is diluted by the streamed
      // doc 3; own terms excluded
      val (sCode, sBody) = get(api.address, "/search/significant/alpha")
      sCode shouldBe 200
      sBody should include(""""term":"gamma"""")
      sBody should not include (""""term":"alpha"""")
      // more-like-this: doc 2 "alpha gamma" — its keywords reach the
      // alpha-bearing doc 1 (doc 2 itself excluded); unknown ids and
      // non-numeric ids degrade cleanly
      get(api.address, "/search/mlt/2?m=2&k=2") shouldBe
        (200, """[{"rank":1,"doc_id":1}]""")
      get(api.address, "/search/mlt/999") shouldBe (200, "[]")
      get(api.address, "/search/mlt/notanid")._1 shouldBe 400
      // caller errors answer 400 with the library's message, not a 500
      val (badVec, badBody) = get(api.address, "/search/hybrid/alpha")
      badVec shouldBe 400
      badBody should include("vec=")
      get(api.address, "/search/phrase/%21%21%21")._1 shouldBe 400 // "!!!"
    } finally api.stop()
  }

  test("a non-integral ANN id column answers 400 with the column name, " +
      "not an unhandled 500") {
    import spark.implicits._
    val dir = graft.io.Spill.tempDir("graft-http-idx-")
    LexicalIndex.write(
      Seq(1L -> "alpha beta").toDF("doc_id", "text"),
      "doc_id", "text", s"$dir/lex", nBuckets = 4, positional = true)
    // string ids (numeric content, so the scan and ranking survive —
    // the failure must land exactly on the route's id read)
    Similarity.writeIvfIndex(
      Seq("1" -> Array(1.0, 0.0), "2" -> Array(0.0, 1.0))
        .toDF("vec_id", "embedding"),
      "vec_id", "embedding", s"$dir/ann", nList = 2)
    val api = new HttpApi(new Serving)
      .retrieval(HttpApi.Retrieval(spark,
        lexicalIndexPath = Some(s"$dir/lex"),
        annIndexPath = Some(s"$dir/ann")))
      .start()
    try {
      val (code, body) = get(api.address, "/search/hybrid/alpha?vec=1.0,0.0")
      code shouldBe 400
      body should include("vec_id")
      body should include("integral")
    } finally api.stop()
  }

  test("search routes answer 404 until retrieval is configured, and 400 " +
      "when the route's index is absent") {
    val api = new HttpApi(new Serving).start()
    try {
      get(api.address, "/search/bm25/alpha")._1 shouldBe 404
    } finally api.stop()
    val api2 = new HttpApi(new Serving)
      .retrieval(HttpApi.Retrieval(spark)).start()
    try {
      val (code, body) = get(api2.address, "/search/bm25/alpha")
      code shouldBe 400
      body should include("no lexical index")
      get(api2.address, "/search/hybrid/alpha?vec=1.0,0.0")._1 shouldBe 400
      get(api2.address, "/search/fuzzy/alpha")._1 shouldBe 400
      get(api2.address, "/search/facets/alpha")._1 shouldBe 400
    } finally api2.stop()
    // a lexical index WITHOUT a corpus table: passage keeps the
    // id-only shape (no snippet field), facets names the missing knob
    import spark.implicits._
    val lexDir = graft.io.Spill.tempDir("graft-http-idx-") + "/lex"
    LexicalIndex.write(Seq(1L -> "alpha beta").toDF("doc_id", "text"),
      "doc_id", "text", lexDir, nBuckets = 4, positional = true)
    val api3 = new HttpApi(new Serving)
      .retrieval(HttpApi.Retrieval(spark,
        lexicalIndexPath = Some(lexDir))).start()
    try {
      get(api3.address, "/search/passage/alpha?window=2") shouldBe
        (200, """[{"rank":1,"doc_id":1,"n_hits":1,"start":0}]""")
      // the index introspection route mirrors /metadata for retrieval
      val (iCode, iBody) = get(api3.address, "/search/index")
      iCode shouldBe 200
      iBody should include(""""n_buckets":4""")
      iBody should include(""""positional":true""")
      iBody should include(""""posting_generations":["init"]""")
      iBody should include(""""folded_batches":0""")
      iBody should include(""""n_docs":1""")
      iBody should include(""""total_len":2""")
      val (fCode, fBody) = get(api3.address, "/search/facets/alpha")
      fCode shouldBe 400
      fBody should include("docsPath")
    } finally api3.stop()
  }

  test("concurrent searches run in per-request scheduler pools and all " +
      "return the correct body (the FAIR-sharing hook; dispatch never " +
      "serializes or cross-talks)") {
    import spark.implicits._
    val lexDir = graft.io.Spill.tempDir("graft-http-idx-") + "/lex"
    LexicalIndex.write(
      (1L to 40L).map(i => i -> s"alpha term${i % 7} term${i % 5}")
        .toDF("doc_id", "text"),
      "doc_id", "text", lexDir, nBuckets = 8)
    val api = new HttpApi(new Serving)
      .retrieval(HttpApi.Retrieval(spark, lexicalIndexPath = Some(lexDir)))
      .start()
    // capture each search job's scheduler pool: searchRoute pins a
    // thread-scoped "graft-search-<tid>" pool, so concurrent handlers
    // submit under DISTINCT pools (under spark.scheduler.mode=FAIR on
    // a serving deployment that is fair slot sharing; under this test
    // session's FIFO mode the property is inert but observable)
    val pools = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        val p = j.properties.getProperty("spark.scheduler.pool")
        if (p != null && p.startsWith("graft-search-")) pools.add(p)
      }
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      val expected = get(api.address, "/search/bm25/alpha?k=3")
      expected._1 shouldBe 200
      val latch = new java.util.concurrent.CountDownLatch(1)
      val results = (1 to 4).map { _ =>
        val f = new java.util.concurrent.FutureTask(() => {
          latch.await()
          get(api.address, "/search/bm25/alpha?k=3")
        })
        new Thread(f).start(); f
      }
      latch.countDown()
      results.foreach(_.get() shouldBe expected)
      // at least two handler threads served concurrently, each under
      // its own pool (exact count depends on the server's thread
      // reuse); listener events are delivered asynchronously
      eventually(timeout(Span(20, Seconds))) {
        pools.size should be >= 2
      }
    } finally {
      api.stop()
      spark.sparkContext.removeSparkListener(listener)
    }
  }
}
