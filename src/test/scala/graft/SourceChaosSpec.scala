package graft

import java.nio.file.Files

import graft.testing.{ChaosMedium, GuaranteeSuite}

/** The SAME chaos scenario — kill the query mid-stream, produce while it is
  * down, restart from the checkpoint, assert at-least-once + per-key order
  * + serial-per-key — over BOTH DSv2 media. The checkers are identical
  * objects in both runs; only the medium changes. This is the testkit's
  * source-genericity proof: the guarantees hold because of the offset
  * semantics (checkpointed resume, per-segment append order, key routing),
  * not because of anything broker-shaped.
  */
class SourceChaosSpec extends SparkTestBase {

  test("chaos scenario over graft-kafka: all three guarantees hold") {
    val suite = GuaranteeSuite()
    suite.chaosTestOver(spark,
      ChaosMedium.kafka(Files.createTempDirectory("graft-chaos-kafka").toString,
        "chaos", nPartitions = 4),
      nKeys = 20, total = 1000)(identity)
  }

  test("chaos scenario over graft-jsonl: all three guarantees hold") {
    val suite = GuaranteeSuite()
    suite.chaosTestOver(spark,
      ChaosMedium.jsonl(Files.createTempDirectory("graft-chaos-jsonl").toString, nFiles = 4),
      nKeys = 20, total = 1000)(identity)
  }

  test("the jsonl medium's checkers still detect loss (scenario has bite)") {
    // same medium, but a pipeline that silently DROPS one key's tasks —
    // at-least-once must trip, proving the parameterized run isn't vacuous
    val suite = GuaranteeSuite()
    val e = intercept[AssertionError] {
      suite.chaosTestOver(spark,
        ChaosMedium.jsonl(Files.createTempDirectory("graft-chaos-jsonl-neg").toString,
          nFiles = 4),
        nKeys = 10, total = 200)(_.filter(org.apache.spark.sql.functions.col("key") =!= "key-3"))
    }
    assert(e.getMessage.contains("never processed"))
  }
}
