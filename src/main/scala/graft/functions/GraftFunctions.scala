package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.types.IntegerType

/** SQL registration for the custom Catalyst expressions, so `spark.sql`
  * users get the same operators as the Column API:
  * `SELECT poly_hash(text)`, `vector_dot(a, b)`, `minhash_sig(shingles, 128)`.
  */
object GraftFunctions {

  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("poly_hash", es => PolyHash(es.head), "scala_udf")
    reg.createOrReplaceTempFunction("vector_dot", es => VectorDot(es(0), es(1)), "scala_udf")
    reg.createOrReplaceTempFunction("minhash_sig", {
      case Seq(child, Literal(n: Int, IntegerType)) => MinHashSig(child, n)
      case es => throw new IllegalArgumentException(
        s"minhash_sig(array<string>, <int literal>), got ${es.size} args")
    }, "scala_udf")
    reg.createOrReplaceTempFunction("simhash_sig", {
      case Seq(child) => SimHashSig(child)
      case es => throw new IllegalArgumentException(
        s"simhash_sig(array<string>), got ${es.size} args")
    }, "scala_udf")
    reg.createOrReplaceTempFunction("text_profile", {
      case Seq(child) => TextProfile(child)
      case es => throw new IllegalArgumentException(
        s"text_profile(<string>), got ${es.size} args")
    }, "scala_udf")
    reg.createOrReplaceTempFunction("word_shingles", {
      case Seq(child, Literal(n: Int, IntegerType)) => WordShingles(child, n)
      case es => throw new IllegalArgumentException(
        s"word_shingles(<string>, <int literal>), got ${es.size} args")
    }, "scala_udf")
    reg.createOrReplaceTempFunction("sign_band_keys", {
      case Seq(child, Literal(bits: Int, IntegerType), Literal(bands: Int, IntegerType)) =>
        SignBandKeys(child, bits, bands)
      case es => throw new IllegalArgumentException(
        s"sign_band_keys(array<float|double>, <int literal>, <int literal>), got ${es.size} args")
    }, "scala_udf")
  }
}
