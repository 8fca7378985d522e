package graft.functions

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** [[JsonFunctions.jsonSetFields]] must be truly schema-less, like the
  * reference's Gson-backed mutation (`serde/JsonObjectSerdeTests.java:61-64`
  * adds `processed` to whatever document arrived): every top-level field —
  * known or not, of any JSON type — survives, and an existing key is
  * overwritten in place, matching `json_merge_patch` update semantics.
  */
class JsonFunctionsSpec extends AnyFunSuite with Matchers with SparkSpec {

  private def mutate(docs: Seq[String]): Seq[String] = {
    import spark.implicits._
    docs.toDF("props")
      .select(JsonFunctions.jsonSetFields(col("props"),
        "processed" -> parse_json(lit("true"))).as("enriched"))
      .collect().map(_.getString(0)).toSeq
  }

  test("unknown fields of every JSON type are preserved, types intact") {
    mutate(Seq(
      """{"k": 17, "extra": "hello", "nested": {"a": [1, 2]}, "f": 1.5}""",
      """{"k": 3}""",
      """{"a": null, "b": [true, "x"], "c": -0.25, "d": "q"}""")) shouldBe Seq(
      """{"k":17,"extra":"hello","nested":{"a":[1,2]},"f":1.5,"processed":true}""",
      """{"k":3,"processed":true}""",
      """{"a":null,"b":[true,"x"],"c":-0.25,"d":"q","processed":true}""")
  }

  test("existing key is overwritten IN PLACE (merge-patch update)") {
    mutate(Seq("""{"k": 5, "processed": false, "tail": 9}""")) shouldBe
      Seq("""{"k":5,"processed":true,"tail":9}""")
  }

  test("multiple fields set in one call, later field may overwrite") {
    import spark.implicits._
    Seq("""{"k": 1, "keep": "yes"}""").toDF("props")
      .select(JsonFunctions.jsonSetFields(col("props"),
        "processed" -> parse_json(lit("true")),
        "score" -> parse_json(lit("0.5"))).as("enriched"))
      .collect().map(_.getString(0)).toSeq shouldBe
      Seq("""{"k":1,"keep":"yes","processed":true,"score":0.5}""")
  }

  test("property: arbitrary flat documents round-trip all unknown keys") {
    import spark.implicits._
    val scalar: Gen[String] = Gen.oneOf(
      Gen.chooseNum(-1000, 1000).map(_.toString),
      Gen.alphaNumStr.map(s => "\"" + s.take(8) + "\""),
      Gen.oneOf("true", "false", "null"))
    val doc: Gen[(String, List[(String, String)])] = for {
      n <- Gen.chooseNum(0, 5)
      keys <- Gen.listOfN(n, Gen.identifier.map(_.take(6))).map(_.distinct)
      vals <- Gen.listOfN(keys.size, scalar)
    } yield {
      val kvs = keys.zip(vals)
      (kvs.map { case (k, v) => s""""$k": $v""" }.mkString("{", ", ", "}"), kvs)
    }

    val prop = Prop.forAll(doc) { case (json, kvs) =>
      val out = Seq(json).toDF("props")
        .select(JsonFunctions.jsonSetFields(col("props"),
          "processed" -> parse_json(lit("true"))).as("e"))
        .head().getString(0)
      val expected = (kvs.filterNot(_._1 == "processed") :+ ("processed" -> "true"))
        .map { case (k, v) => s""""$k":$v""" }.mkString("{", ",", "}")
      out == expected
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(40), prop)
    assert(res.passed, res.status.toString)
  }
}
