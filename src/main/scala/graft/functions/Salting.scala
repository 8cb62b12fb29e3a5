package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Explicit key salting for skew that AQE can't fix at plan-rewrite time.
  *
  * AQE's runtime skew-join split (on by default) handles most hot-key
  * shuffles; explicit salting remains the tool when the skewed side must
  * ALSO aggregate by the hot key downstream, or when a deterministic
  * partition layout is required. Shape: the probe side appends a
  * content-derived salt to the key (one hot key's rows spread over
  * `saltFactor` reducers), the build side replicates each row once per salt
  * value, and the join runs on (key, salt) — result-identical to the
  * unsalted equi-join (spec-pinned), cost = saltFactor× the build side
  * (choose the smaller side to replicate).
  */
object Salting {

  private def checkArgs(df: DataFrame, saltFactor: Int): Unit = {
    require(saltFactor > 0, s"saltFactor must be positive, got $saltFactor")
    require(!df.columns.contains("__salt"),
      "input already has a __salt column (nested salting would silently drop it)")
  }

  /** Probe-side salt: deterministic per row (content hash, never rand() —
    * retries and speculative tasks must salt identically).
    */
  def saltedProbe(df: DataFrame, saltBy: Column, saltFactor: Int): DataFrame = {
    checkArgs(df, saltFactor)
    df.withColumn("__salt", pmod(xxhash64(saltBy), lit(saltFactor)).cast("int"))
  }

  /** Build-side replication: every row carried once per salt value. */
  def saltedBuild(df: DataFrame, saltFactor: Int): DataFrame = {
    checkArgs(df, saltFactor)
    df.withColumn("__salt", explode(lit((0 until saltFactor).toArray)))
  }

  /** Inner equi-join on `keys` with the hot-key shuffle spread over
    * `saltFactor` partitions per key.
    */
  def saltedJoin(probe: DataFrame, build: DataFrame, keys: Seq[String],
      probeSaltBy: Column, saltFactor: Int): DataFrame =
    saltedProbe(probe, probeSaltBy, saltFactor)
      .join(saltedBuild(build, saltFactor), keys :+ "__salt")
      .drop("__salt")
}
