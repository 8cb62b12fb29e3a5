package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {

  /** JSON string escape: backslash, quote, and ALL control chars (<0x20) —
    * a tab or CR in builder-authored SQL (or an exception message, in
    * Bench's error map) would otherwise make the driver's json.load fail.
    * ONE escaper for both driver-consumed JSON emitters, so a fix to one
    * can't silently skip the other.
    */
  private[graft] def jstr(s: String): String = "\"" + s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""

  def main(args: Array[String]): Unit = {
    val (sfDir, outDir) = (args(0), args(1))
    // optional 3rd arg (local iteration only): comma-separated query-name filter
    val only: Option[Set[String]] = args.lift(2).map(_.split(",").toSet)
    // FIXED default (not host cores): this is the correctness gate, and the
    // partition count determines float-aggregation grouping — results must
    // not depend on which machine runs the dump. local[32] is fine on fewer
    // cores (threads just share them).
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // Pre-build the batch serving stores on the overlapped pool (r21): the
    // builds are the same ensureStore builders the q_store_* queries would
    // trigger lazily one-by-one, so the write→read coverage is unchanged —
    // only the wall time moves (the store queries then read the memoized
    // paths). The streaming-engine stores stay lazy by design: their builds
    // ARE the behavior their queries gate. A failed build is non-fatal here
    // exactly like a lazy one — the owning query retries it and reports.
    if (only.isEmpty)
      try SparkEntry.prepareStores(spark, sfDir)
      catch { case e: Throwable =>
        System.err.println(s"[verify] store pre-build failed (queries will retry): ${e.getMessage}")
      }
    SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
      // per-query cache scope (same hygiene as Bench): the pair generators
      // persist self-join intermediates for the duration of one execution
      spark.catalog.clearCache()
    }
    val json = SparkEntry.oracleSql
      .filter { case (k, _) => only.forall(_.contains(k)) }
      .map { case (k, v) => s"${Verify.jstr(k)}: ${Verify.jstr(v)}" }
      .mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
