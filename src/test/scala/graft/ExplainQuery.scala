package graft
import org.apache.spark.sql.SparkSession
/** Print the physical plan of named SparkEntry queries (test scope).
  * SPARK_GRAFT_EXPLAIN_MODE=formatted switches to `explain("formatted")`
  * output (the r21 plans/ deliverable); default stays SimpleMode, which is
  * what the PlanSpec assertions quote.
  */
object ExplainQuery {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val mode = sys.env.getOrElse("SPARK_GRAFT_EXPLAIN_MODE", "simple") match {
      case "formatted" => org.apache.spark.sql.execution.FormattedMode
      case _ => org.apache.spark.sql.execution.SimpleMode
    }
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    args.foreach { n =>
      println(s"===== $n =====")
      println(SparkEntry.queries(n)(spark, dir).queryExecution.explainString(mode))
    }
    spark.stop()
  }
}
