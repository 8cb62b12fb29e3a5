package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

object HashFunctions {

  /** Deterministic, engine-portable 60-bit hash: the first 15 hex digits of
    * md5. Used where the DuckDB oracle must reproduce the value exactly
    * (`CAST('0x' || substr(md5(s), 1, 15) AS BIGINT)`). For hot paths with no
    * oracle-parity need, prefer the built-in `xxhash64` (codegen'd, no string
    * round-trip).
    */
  def portableHash64(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")
}
