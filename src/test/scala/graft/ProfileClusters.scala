package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc stage timing for the dedup-ngram family (test-scope tool). */
object ProfileClusters {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"${(System.nanoTime() - t0) / 1e9}%6.2f  $label"); r
    }
    // warm
    graft.functions.Dedup.ngramJaccardPairs(docs, "doc_id", "text",
      n = 3, threshold = 0.8, maxDocFreq = Some(25L)).count()
    val cap = graft.functions.Dedup.docFreqCap(docs.count())
    time("pairs(0.8, capped).count") {
      graft.functions.Dedup.ngramJaccardPairs(docs, "doc_id", "text",
        n = 3, threshold = 0.8, maxDocFreq = Some(cap)).count()
    }
    time("full q_dedup_clusters") {
      SparkEntry.queries("q_dedup_clusters")(spark, dir).count()
    }
    time("full q_dedup_ngram") {
      SparkEntry.queries("q_dedup_ngram")(spark, dir).count()
    }
    spark.stop()
  }
}
