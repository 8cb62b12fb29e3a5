package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._

/** All per-document token statistics in ONE tokenization pass:
  * token/char/stopword/subword counts plus the language-ID stopword hits.
  * The higher-order-function formulations in [[TextAnalysis]] run
  * interpreted (Spark evaluates lambda-bearing expressions outside codegen)
  * and each re-splits the text — five regex tokenizations per row in the
  * text-stats query. This expression tokenizes once and folds every counter
  * in the same loop.
  *
  * Exact-parity notes (the DuckDB oracles pin these):
  *  - trim strips SPACES only (Spark `trim`/DuckDB `trim` semantics — NOT
  *    Java `String.trim`, which also strips control chars);
  *  - lengths count Unicode code points (Spark `length`/DuckDB `length`),
  *    not UTF-16 units;
  *  - splitting "" yields one empty token, like Spark `split` / DuckDB
  *    `string_split_regex`.
  *
  * Stays CodegenFallback deliberately (r17-reviewed): a struct-returning
  * codegen template is invasive, and unlike the array kernels converted in
  * r17 this expression shows no measured dispatch pathology — q_text_stats
  * sits at ~0.2 s wall / sub-second task-cpu with a stable floor.
  */
case class TextProfile(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"text_profile requires string, got $t")
    }

  override def dataType: DataType = TextProfile.schema

  override protected def nullSafeEval(input: Any): Any = {
    val trimmed = Tokenize.trimmed(input.toString)
    // the shared scanner, not split("\\s+", -1): String.split re-compiles
    // its regex EVERY call, and this is the per-row hot loop the scanner
    // exists for — plus a re-typed prologue is how a subtle whitespace
    // divergence slips into one expression with no compile error
    // (Tokenize.scala's doc; scanner ≡ regex is generatively pinned)
    val tokens = Tokenize.tokens(trimmed)
    var (nStop, nSub, en, es, de) = (0L, 0L, 0L, 0L, 0L)
    for (t <- tokens) {
      if (TextProfile.Stopwords.contains(t)) nStop += 1
      val cp = t.codePointCount(0, t.length)
      nSub += math.max(1L, (cp + 3L) / 4L)
      // Locale.ROOT: parity with Spark's locale-independent lower() — the
      // default-locale overload would fold "IN" to dotless-ı under tr_TR
      val lower = t.toLowerCase(java.util.Locale.ROOT)
      if (TextProfile.En.contains(lower)) en += 1
      if (TextProfile.Es.contains(lower)) es += 1
      if (TextProfile.De.contains(lower)) de += 1
    }
    new GenericInternalRow(Array[Any](
      tokens.length.toLong, trimmed.codePointCount(0, trimmed.length).toLong,
      nStop, nSub, en, es, de))
  }

  override protected def withNewChildInternal(newChild: Expression): TextProfile =
    copy(child = newChild)
}

object TextProfile {
  val schema: StructType = StructType(Seq(
    StructField("n_tokens", LongType, nullable = false),
    StructField("n_chars", LongType, nullable = false),
    StructField("n_stopwords", LongType, nullable = false),
    StructField("n_subwords", LongType, nullable = false),
    StructField("en_hits", LongType, nullable = false),
    StructField("es_hits", LongType, nullable = false),
    StructField("de_hits", LongType, nullable = false)))

  private[functions] val Stopwords =
    Set("the", "a", "an", "and", "or", "of", "to", "in", "is", "it")
  private[functions] val En =
    Set("the", "and", "of", "to", "is", "in", "that", "it")
  private[functions] val Es = Set("el", "la", "de", "que", "y", "los", "en", "un")
  private[functions] val De =
    Set("der", "die", "und", "das", "nicht", "ist", "ich", "ein")

  def apply(c: Column): Column =
    GraftColumnBridge.column(TextProfile(GraftColumnBridge.expression(c)))
}
