package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DoubleType, IntegerType}

/** SQL registration for the custom Catalyst expressions, so `spark.sql`
  * users get the same operators as the Column API:
  * `SELECT poly_hash(text)`, `vector_dot(a, b)`, `minhash_sig(shingles, 128)`.
  *
  * Two entry points share one builder table: [[register]] installs temp
  * functions on an existing session (library/driver use), and
  * [[GraftExtensions]] injects the same builders through
  * `SparkSessionExtensions` so a SQL-only deployment (thrift server,
  * spark-sql shell, notebook kernel) gets them at session build via
  * `--conf spark.sql.extensions=graft.GraftExtensions` with no driver code.
  */
object GraftFunctions {

  private def intLit(e: Expression, fn: String): Int = e match {
    case Literal(n: Int, IntegerType) => n
    case other => throw new IllegalArgumentException(
      s"$fn: expected an int literal argument, got $other")
  }

  /** name → (usage doc, builder). One table drives both registration paths
    * so the SQL surface cannot drift between them.
    */
  private[functions] val builders: Seq[(String, String, Seq[Expression] => Expression)] = Seq(
    ("poly_hash", "poly_hash(str) - 64-bit polynomial rolling hash",
      es => PolyHash(es.head)),
    ("vector_dot", "vector_dot(array<float|double>, array<float|double>) - dot product",
      es => VectorDot(es(0), es(1))),
    ("minhash_sig", "minhash_sig(array<string>, <int literal>) - MinHash signature",
      {
        case Seq(child, n) => MinHashSig(child, intLit(n, "minhash_sig"))
        case es => throw new IllegalArgumentException(
          s"minhash_sig(array<string>, <int literal>), got ${es.size} args")
      }),
    ("minhash_band_keys", "minhash_band_keys(array<string>, <int literal>, <int literal>) - LSH band bucket keys",
      {
        case Seq(child, n, b) =>
          MinHashBandKeys(child, intLit(n, "minhash_band_keys"), intLit(b, "minhash_band_keys"))
        case es => throw new IllegalArgumentException(
          s"minhash_band_keys(array<string>, <int literal>, <int literal>), got ${es.size} args")
      }),
    ("simhash_sig", "simhash_sig(array<string>) - 32-bit SimHash signature",
      {
        case Seq(child) => SimHashSig(child)
        case es => throw new IllegalArgumentException(
          s"simhash_sig(array<string>), got ${es.size} args")
      }),
    ("whitespace_tokens", "whitespace_tokens(str) - trim + \\s+ tokenization (the engine's shared scanner)",
      {
        case Seq(child) => WhitespaceTokens(child)
        case es => throw new IllegalArgumentException(
          s"whitespace_tokens(<string>), got ${es.size} args")
      }),
    ("text_profile", "text_profile(str) - token/length/punctuation quality profile struct",
      {
        case Seq(child) => TextProfile(child)
        case es => throw new IllegalArgumentException(
          s"text_profile(<string>), got ${es.size} args")
      }),
    ("word_shingles", "word_shingles(str, <int literal>) - distinct word n-gram shingles",
      {
        case Seq(child, n) => WordShingles(child, intLit(n, "word_shingles"))
        case es => throw new IllegalArgumentException(
          s"word_shingles(<string>, <int literal>), got ${es.size} args")
      }),
    ("repetition_profile", "repetition_profile(str) - within-doc repetition struct (n_tokens, top_bigram_count, distinct_trigrams)",
      {
        case Seq(child) => RepetitionProfile(child)
        case es => throw new IllegalArgumentException(
          s"repetition_profile(<string>), got ${es.size} args")
      }),
    ("int8_quantize", "int8_quantize(array<float|double>) - struct(codes binary, scale float) scalar quantization",
      {
        case Seq(child) => Int8Quantize(child)
        case es => throw new IllegalArgumentException(
          s"int8_quantize(array<float|double>), got ${es.size} args")
      }),
    ("int8_dot", "int8_dot(binary codes, float scale, array<float|double> query) - dequantized dot product",
      {
        case Seq(c, sc, q) => Int8DotScaled(c, sc, q)
        case es => throw new IllegalArgumentException(
          s"int8_dot(binary, float, array<float|double>), got ${es.size} args")
      }),
    ("hashed_bag_logit", "hashed_bag_logit(str, <array<double> literal>, <double literal>) - fastText-style hashed bag-of-tokens linear logit",
      {
        case Seq(child, w, b) if w.foldable && b.foldable =>
          val weights = (w.dataType, w.eval()) match {
            case (ArrayType(DoubleType, _), a: ArrayData) =>
              // reject null slots explicitly (the greedy_subwords guard):
              // UnsafeArrayData.toDoubleArray reads a null slot as 0.0
              // silently, GenericArrayData NPEs — neither is a usable error
              var i = 0
              while (i < a.numElements()) {
                if (a.isNullAt(i)) throw new IllegalArgumentException(
                  s"hashed_bag_logit: weights must not contain null (slot $i)")
                i += 1
              }
              a.toDoubleArray().toSeq
            case (t, _) => throw new IllegalArgumentException(
              s"hashed_bag_logit: weights must be a foldable array<double>, got $t")
          }
          val bias = b.eval() match {
            case d: Double => d
            case other => throw new IllegalArgumentException(
              s"hashed_bag_logit: bias must be a double literal, got $other")
          }
          HashedBagLinear(child, weights, bias)
        case es => throw new IllegalArgumentException(
          s"hashed_bag_logit(str, <array<double> literal>, <double literal>), got ${es.size} args")
      }),
    ("greedy_subwords", "greedy_subwords(str, <array<string> literal> vocab) - WordPiece-style greedy longest-match subword pieces",
      {
        case Seq(child, v) if v.foldable =>
          val vocab = (v.dataType, v.eval()) match {
            case (ArrayType(org.apache.spark.sql.types.StringType, _), a: ArrayData) =>
              a.toObjectArray(org.apache.spark.sql.types.StringType).map { x =>
                if (x == null) throw new IllegalArgumentException(
                  "greedy_subwords: vocab must not contain null")
                x.toString
              }.toSeq
            case (t, _) => throw new IllegalArgumentException(
              s"greedy_subwords: vocab must be a foldable array<string>, got $t")
          }
          GreedySubwords(child, vocab)
        case es => throw new IllegalArgumentException(
          s"greedy_subwords(str, <array<string> literal>), got ${es.size} args")
      }),
    ("zorder_key", "zorder_key(array<long>, <int literal> bits) - Morton (Z-order) interleave key",
      {
        case Seq(child, b) => ZOrderKey(child, intLit(b, "zorder_key"))
        case es => throw new IllegalArgumentException(
          s"zorder_key(array<long>, <int literal> bits), got ${es.size} args")
      }),
    ("sign_band_keys", "sign_band_keys(array<float|double>, <int literal>, <int literal>) - sign-LSH band keys",
      {
        case Seq(child, bits, bands) =>
          SignBandKeys(child, intLit(bits, "sign_band_keys"), intLit(bands, "sign_band_keys"))
        case es => throw new IllegalArgumentException(
          s"sign_band_keys(array<float|double>, <int literal>, <int literal>), got ${es.size} args")
      })
  )

  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    builders.foreach { case (name, _, builder) =>
      reg.createOrReplaceTempFunction(name, builder, "scala_udf")
    }
  }
}

/** `SparkSessionExtensions` injector for the graft SQL functions.
  *
  * Unlike [[GraftFunctions.register]] (temp functions, per-session,
  * requires driver code after session build), this wires the functions
  * into the session's registry at construction — the shape a pure-SQL
  * deployment needs: `spark.sql.extensions=graft.GraftExtensions`.
  */
class GraftExtensions extends (org.apache.spark.sql.SparkSessionExtensions => Unit) {
  override def apply(ext: org.apache.spark.sql.SparkSessionExtensions): Unit =
    GraftFunctions.builders.foreach { case (name, usage, builder) =>
      ext.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage, ""),
        builder))
    }
}
