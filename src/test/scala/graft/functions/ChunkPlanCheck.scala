package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Plan pin for the chunking operator: a narrow projection+generate inside
  * whole-stage codegen — no Exchange anywhere (the 100 TB contract: chunking
  * runs per input partition).
  */
class ChunkPlanCheck extends SparkSpec {
  import spark.implicits._

  test("chunkByTokens plans without a shuffle, inside codegen") {
    val df = Seq((1L, (1 to 200).map("t" + _).mkString(" "))).toDF("doc_id", "text")
    val plan = Chunking.chunkByTokens(df, "doc_id", "text", 64, 16)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"chunking must not shuffle:\n$plan")
    // "*(1)" prefixes = every operator fused into codegen stage 1
    assert(plan.linesIterator.forall(_.trim.matches("""[+-]*\s*\*\(1\).*""")),
      s"expected one fully-fused codegen stage:\n$plan")
  }
}
