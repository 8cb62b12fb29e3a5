package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.Sampling

/** Training-shard export: content-addressed assignment, reproducible
  * bytes, round-trip completeness.
  */
class CurationSpec extends SparkSpec {

  import spark.implicits._

  private def docs(n: Int) =
    (0 until n).map(i => (i.toLong, s"doc text number $i with body ${i * 37}"))
      .toDF("doc_id", "text")

  private def readBack(dir: String) =
    spark.read.parquet(dir)
      .select(col("doc_id"), col("text"), col("shard").cast("long").as("shard"))

  test("writeTrainingShards: round-trip is complete, shard is the content " +
      "hash bucket, files are (shard, id)-sorted") {
    val dir = Files.createTempDirectory("shards").toString
    val d = docs(200)
    Curation.writeTrainingShards(d, dir, "doc_id", "text", nShards = 8)

    val back = readBack(dir)
    assert(back.count() == 200)
    // every doc sits in its content-addressed shard — no drops, no dupes
    val expected = d.select(col("doc_id"),
      Sampling.bucket(col("text"), 8).as("shard"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val actual = back.select("doc_id", "shard")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(actual == expected)
    assert(actual.values.toSet.size == 8, "200 docs should populate all 8 shards")
    // within every file, rows are doc_id-ascending (reproducible bytes)
    val files = new java.io.File(dir).listFiles().filter(_.getName.startsWith("shard="))
      .flatMap(_.listFiles()).filter(_.getName.endsWith(".parquet")).map(_.toString)
    assert(files.nonEmpty)
    files.foreach { f =>
      val ids = spark.read.parquet(f).select("doc_id").collect().map(_.getLong(0))
      assert(ids.sameElements(ids.sorted), s"unsorted shard file $f")
    }
  }

  test("writeTrainingShards: assignment and order survive a different " +
      "upstream partitioning (retry/backfill determinism)") {
    val dirA = Files.createTempDirectory("shardsA").toString
    val dirB = Files.createTempDirectory("shardsB").toString
    val d = docs(120)
    Curation.writeTrainingShards(d, dirA, "doc_id", "text", nShards = 4)
    Curation.writeTrainingShards(d.repartition(7).sortWithinPartitions(desc("doc_id")),
      dirB, "doc_id", "text", nShards = 4)
    def manifest(dir: String) = readBack(dir)
      .groupBy("shard").agg(sort_array(collect_list("doc_id")).as("ids"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(manifest(dirA) == manifest(dirB))
  }

  test("writeTrainingShards: non-positive shard count is refused") {
    intercept[IllegalArgumentException](
      Curation.writeTrainingShards(docs(3), "/tmp/unused", "doc_id", "text", 0))
  }

  test("curate collapses FULLY duplicated rows (same id and text), not just " +
      "distinct-id copies — the at-least-once re-ingestion shape") {
    // long, clean texts so the quality/repetition gate keeps them; id 1's
    // row is delivered twice verbatim, id 2/3 are a distinct-id dup pair
    val base = Seq(
      (1L, "the quick brown fox jumps over the lazy dog near the quiet river bank today"),
      (2L, "the calm grey wolf walks under the bright morning sun across a wide green field"),
      (3L, "the calm grey wolf walks under the bright morning sun across a wide green field"))
    val docsDf = (base ++ base.take(1)).toDF("doc_id", "text")
    val bench = Seq("completely unrelated benchmark line").toDF("bench_text")
    val out = Curation.curate(docsDf, "doc_id", "text", bench, "bench_text")
      .select("doc_id").as[Long].collect().sorted.toSeq
    // one survivor per distinct text: id 1 once (the r16 review found the
    // old min-over-window filter kept BOTH verbatim copies), and min id 2
    // of the distinct-id pair
    assert(out == Seq(1L, 2L))
  }
}
