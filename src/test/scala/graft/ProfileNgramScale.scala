package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Ad-hoc A/B harness for the ngram pair plan at ×N scale (test-scope
  * tool): replicates the inverted-index strategy with independent knobs
  * for the join width and the agg re-key so the ×30 spill fix can be
  * attributed — the r16 leg spilled 15.5 GB through static 32-wide
  * shuffles, but the first fix attempt (join@prop + agg re-key@prop)
  * removed the spill while DOUBLING the warm wall (9.5 → 18.4 s), so the
  * two knobs need separating. Reads the amplified dir a prior BenchScale
  * run left behind (target/bench_scale/amp<N>).
  */
object ProfileNgramScale {
  def main(args: Array[String]): Unit = {
    val rep = sys.env.getOrElse("SPARK_GRAFT_SCALE", "30").toInt
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val spillMem = new java.util.concurrent.atomic.AtomicLong(0L)
    val spillDisk = new java.util.concurrent.atomic.AtomicLong(0L)
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        val m = te.taskMetrics
        if (m != null) { spillMem.addAndGet(m.memoryBytesSpilled)
          spillDisk.addAndGet(m.diskBytesSpilled): Unit }
      }
    })
    def snap(): (Long, Long) = {
      org.apache.spark.GraftBenchBridge.drainListenerBus(spark.sparkContext, 10000L): Unit
      (spillMem.get(), spillDisk.get())
    }

    val ampDoc = new java.io.File(s"target/bench_scale/amp$rep/documents.parquet")
    require(ampDoc.isDirectory, s"run BenchScale at SPARK_GRAFT_SCALE=$rep first: $ampDoc missing")
    val docs = spark.read.parquet(ampDoc.getAbsolutePath)
    val nDocs = docs.count()
    val cap = functions.Dedup.docFreqCap(nDocs)
    println(s"profile ngram scale rep=$rep docs=$nDocs cap=$cap")

    // inline replica of shingleIndexWithDf (private in Dedup)
    def index(): (DataFrame, DataFrame) = {
      val sh = docs.repartition(64).select(col("doc_id"),
        explode(functions.TextAnalysis.distinctShingles(col("text"), 3)).as("shingle"))
        .cache()
      val df = sh.groupBy("shingle").agg(count(lit(1)).as("df")).cache()
      val hot = df.where(col("df") > cap).select("shingle")
      (sh.join(broadcast(hot), Seq("shingle"), "left_anti"),
        df.where(col("df") <= cap))
    }

    // the full-index pair plan with independent knobs
    def pairs(joinParts: Int, aggParts: Int): DataFrame = {
      val (sh, _) = index()
      val wide = if (joinParts > 32) sh.repartition(joinParts, col("shingle")) else sh
      val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("n_sh"))
      val joined = wide.as("a").join(wide.as("b"),
          col("a.shingle") === col("b.shingle") && col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      val keyed = if (aggParts > 0)
        joined.repartition(aggParts, col("doc_a"), col("doc_b")) else joined
      val inter = keyed.groupBy(col("doc_a"), col("doc_b"))
        .agg(count(lit(1)).as("inter"))
      inter
        .join(sizes.as("sa"), col("doc_a") === col("sa.doc_id"))
        .join(sizes.as("sb"), col("doc_b") === col("sb.doc_id"))
        .select(col("doc_a"), col("doc_b"),
          (col("inter") / (col("sa.n_sh") + col("sb.n_sh") - col("inter"))).as("jaccard"))
        .where(col("jaccard") >= 0.5)
    }

    def run(tag: String, mk: () => DataFrame): Unit = {
      spark.catalog.clearCache()
      System.gc()
      val (m0, d0) = snap()
      val t0 = System.nanoTime()
      mk().queryExecution.toRdd.foreach(_ => ())
      val wall = (System.nanoTime() - t0) / 1e9
      val (m1, d1) = snap()
      println(f"variant=$tag%-28s wall=$wall%6.2f spill_mem_mb=${(m1 - m0) / 1048576}%-7d spill_disk_mb=${(d1 - d0) / 1048576}%d")
    }

    // JIT/codegen warm (untimed)
    run("warmup", () => pairs(76, 76))
    // index-build baseline: what every variant pays before the join
    run("index_only", () => { val (sh, _) = index(); sh.groupBy("doc_id").agg(count(lit(1))) })
    val ampDir = ampDoc.getParentFile.getAbsolutePath
    Seq(1, 2).foreach { round =>
      run(s"A_join32_agg32_r$round", () => pairs(32, 0))   // r16 shape
      run(s"B_join76_agg32_r$round", () => pairs(76, 0))   // join widened only
      run(s"C_join76_rekey76_r$round", () => pairs(76, 76)) // first fix attempt
      run(s"D_join32_rekey76_r$round", () => pairs(32, 76)) // agg re-key only
      run(s"E_join76_rekey152_r$round", () => pairs(76, 152))
      // the REAL code path the scale leg times (spread + stats dispatch +
      // docs.count + round()), for reconciling harness vs leg numbers
      run(s"F_real_query_r$round",
        () => SparkEntry.queries("q_dedup_ngram")(spark, ampDir))
    }
    spark.stop()
  }
}
