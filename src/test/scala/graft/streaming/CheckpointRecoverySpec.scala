package graft.streaming

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec
import graft.io.FileSource
import graft.serving.Serving

/** R3 processing guarantee (SURVEY §2.5): Structured Streaming's
  * checkpointed offsets + state give exactly-once results through a
  * stop/restart — the engine's upgrade over the reference's at-least-once
  * default (`processing.guarantee` never set there). A restarted query must
  * resume from the checkpoint: old input is not re-counted, new input lands
  * on top of recovered state.
  */
class CheckpointRecoverySpec extends AnyFunSuite with Matchers with SparkSpec {

  test("word counts survive a query restart without double-counting") {
    import spark.implicits._

    val srcDir = Files.createTempDirectory("graft-recover-src").toString
    val ckpt = checkpoint()

    def writeWave(name: String, lines: Seq[String]): Unit =
      lines.toDF("value").coalesce(1).write.mode("append").parquet(srcDir)

    def runWave(): Map[String, Long] = {
      val serving = new Serving
      val counts = Topologies.wordCount(
        FileSource(srcDir, schemaDDL = Some("value STRING")).readStream(spark))
      val q = serving.maintain(counts, "wc_recover", "word", ckpt)
      try {
        q.processAllAvailable()
        serving.table("wc_recover").get.all
          .map { case (k, m) => k -> m("count").asInstanceOf[Long] }.toMap
      } finally q.stop()
    }

    writeWave("wave1", Seq("spark counts words", "spark again"))
    val afterWave1 = runWave()
    afterWave1("spark") shouldBe 2L
    afterWave1("words") shouldBe 1L

    // restart: new query instance + fresh serving table, same checkpoint;
    // only the new file is read, on top of recovered aggregation state
    writeWave("wave2", Seq("spark once more"))
    val afterWave2 = runWave()
    afterWave2("spark") shouldBe 3L // 2 recovered + 1 new, not 4 (re-read) or 1 (reset)
    afterWave2("once") shouldBe 1L
    // update mode re-emits only keys the new wave touched — untouched keys
    // from wave1 never reach the fresh serving table
    afterWave2.contains("words") shouldBe false

    Files.walk(Paths.get(srcDir)).count() should be > 0L
  }
}
