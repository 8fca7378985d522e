package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** The round-2 verdict's q45 done-criterion, pinned: running the training
  * pipeline end-to-end must leave NO cached plans behind (the old
  * `.persist` with no release stranded blocks for the session lifetime;
  * the spill-file intermediate by construction cannot).
  */
class PipelineLeakSpec extends AnyFunSuite with Matchers with SparkSpec {

  test("q45 leaves the cache manager empty after full materialization") {
    spark.sharedState.cacheManager.clearCache()
    val rows = SparkEntry.queries("q45_training_pipeline")(
      spark, "/root/testdata/sf0.001").collect()
    rows should not be empty
    spark.sharedState.cacheManager.isEmpty shouldBe true
  }
}
