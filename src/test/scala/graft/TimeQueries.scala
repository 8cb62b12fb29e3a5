package graft
import org.apache.spark.sql.SparkSession
/** Ad-hoc per-query cpu timer for A/B adjudication (test scope only). */
object TimeQueries {
  def main(args: Array[String]): Unit = {
    val names = args.toSeq
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def cpu(): Long =
      java.lang.management.ManagementFactory.getOperatingSystemMXBean match {
        case b: com.sun.management.OperatingSystemMXBean => b.getProcessCpuTime
        case _ => -1L
      }
    // warm codegen once at sf0.001
    val warm = "/root/testdata/sf0.001"
    names.foreach(n => SparkEntry.queries(n)(spark, warm).queryExecution.toRdd.foreach(_ => ()))
    for (round <- 1 to 3; n <- names) {
      spark.catalog.clearCache()
      val t0 = System.nanoTime(); val c0 = cpu()
      SparkEntry.queries(n)(spark, dir).queryExecution.toRdd.foreach(_ => ())
      println(f"TIMING $n round=$round wall=${(System.nanoTime()-t0)/1e9}%.2f cpu=${(cpu()-c0)/1e9}%.1f")
    }
    spark.stop()
  }
}
