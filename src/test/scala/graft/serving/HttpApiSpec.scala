package graft.serving

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec
import graft.streaming.Topologies

/** End-to-end serving test, mirroring the reference's HTTP assertions
  * (`test/.../WordCountServiceTests.java:69-87` asserts exact bodies like
  * `{"fox":1}` then `{"fox":3}`; `MetadataServiceTests.java:68-105` asserts
  * `/metadata` and `/metadata/{store}`): drive records through real
  * streaming queries, then GET the endpoints and check the JSON bodies.
  */
class HttpApiSpec extends AnyFunSuite with Matchers with SparkSpec {

  private val client = HttpClient.newHttpClient()

  private def get(addr: String, path: String): (Int, String) = {
    val res = client.send(
      HttpRequest.newBuilder(URI.create(s"http://$addr$path")).GET().build(),
      HttpResponse.BodyHandlers.ofString())
    (res.statusCode(), res.body())
  }

  test("wordcount, purchases and metadata endpoints serve live streaming state") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._

    val serving = new Serving
    val api = new HttpApi(serving).start()

    val words = MemoryStream[String]
    val wcQuery = serving.maintain(
      Topologies.wordCount(words.toDF()), "wordcount", "word", checkpoint())

    val purchases = MemoryStream[String]
    val pQuery = serving.maintain(
      Topologies.purchases(Topologies.parsePurchases(purchases.toDF())),
      "purchases", "k", checkpoint())

    try {
      words.addData("the fox jumps", "a fox again and again", "fox three")
      wcQuery.processAllAvailable()
      purchases.addData(
        """{"customerId":7,"productId":101,"quantity":2}""",
        """{"customerId":7,"productId":101,"quantity":3}""",
        """{"customerId":7,"productId":202,"quantity":1}""")
      pQuery.processAllAvailable()

      // point lookup — exact body shape {key: count}
      get(api.address, "/wordcount/fox") shouldBe (200, """{"fox":3}""")
      get(api.address, "/wordcount/again") shouldBe (200, """{"again":2}""")
      get(api.address, "/wordcount/absent")._1 shouldBe 404

      // prefix range scan — {cust-prod: {count,total}} merged map
      get(api.address, "/purchases/7") shouldBe (200,
        """{"7-101":{"count":2,"total":5},"7-202":{"count":1,"total":1}}""")
      get(api.address, "/purchases/99")._1 shouldBe 404

      // live update: one more record, the served body changes
      words.addData("fox once more")
      wcQuery.processAllAvailable()
      get(api.address, "/wordcount/fox") shouldBe (200, """{"fox":4}""")

      // URL-encoded keys decode like the reference's Javalin path params
      // (underscore is a \w char, so the tokenizer keeps the word whole)
      words.addData("snake_case words here")
      wcQuery.processAllAvailable()
      get(api.address, "/wordcount/snake%5Fcase") shouldBe (200, """{"snake_case":1}""")

      // metadata listing: host -> store names
      val (mStatus, mBody) = get(api.address, "/metadata")
      mStatus shouldBe 200
      mBody shouldBe s"""{"${api.address}":["purchases","wordcount"]}"""
      get(api.address, "/metadata/wordcount") shouldBe (200,
        s"""{"${api.address}":["wordcount"]}""")
      get(api.address, "/metadata/nope")._1 shouldBe 404
    } finally { wcQuery.stop(); pQuery.stop(); api.stop() }
  }
}
