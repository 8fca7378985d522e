package graft.io

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** Spill lifetime management: `scoped` must release exactly the spill
  * directories its body created — not frames the caller spilled earlier
  * (the foreachBatch model-table contract) — and `releaseAll` still
  * drains everything.
  */
class SpillSpec extends AnyFunSuite with Matchers with SparkSpec {
  import spark.implicits._

  private def dirOf(df: org.apache.spark.sql.DataFrame): String =
    df.inputFiles.head.replaceFirst("file:", "").replaceFirst("/[^/]*$", "")

  private def exists(dir: String): Boolean = new java.io.File(dir).exists()

  test("scoped releases the body's spills and preserves the caller's") {
    val outer = Spill(Seq(1, 2, 3).toDF("a"), "spillspec-outer-")
    val outerDir = dirOf(outer)

    var innerDir: String = null
    val result = Spill.scoped {
      val inner = Spill(Seq(4, 5).toDF("b"), "spillspec-inner-")
      innerDir = dirOf(inner)
      exists(innerDir) shouldBe true
      inner.count()
    }
    result shouldBe 2L
    exists(innerDir) shouldBe false // the epoch temporary is gone
    exists(outerDir) shouldBe true // the caller's model table survives
    outer.count() shouldBe 3L // and still reads

    // a later global drain removes the outer spill exactly once (the
    // scoped release deregistered the inner one — no double delete)
    Spill.releaseAll()
    exists(outerDir) shouldBe false
  }

  test("scoped bodies nest: each level releases only its own spills") {
    var d1: String = null
    var d2: String = null
    Spill.scoped {
      d1 = dirOf(Spill(Seq(1).toDF("a"), "spillspec-n1-"))
      Spill.scoped {
        d2 = dirOf(Spill(Seq(2).toDF("a"), "spillspec-n2-"))
        exists(d2) shouldBe true
      }
      exists(d2) shouldBe false // inner scope closed
      exists(d1) shouldBe true // outer scope still open
    }
    exists(d1) shouldBe false
  }

  test("a scoped body's exception still releases its spills") {
    var d: String = null
    an[IllegalStateException] should be thrownBy Spill.scoped {
      d = dirOf(Spill(Seq(1).toDF("a"), "spillspec-ex-"))
      throw new IllegalStateException("boom")
    }
    exists(d) shouldBe false
  }
}
