package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._

/** Within-document repetition statistics in ONE tokenization pass — the
  * Gopher-family quality signals (Rae et al. 2021, §A1.1: "fraction of
  * characters in the most common 2-gram", "fraction of duplicated
  * n-grams") that every pretraining pipeline filters on, token-based:
  *
  *  - `n_tokens` — whitespace token count ([[TextProfile]] semantics:
  *    space-only trim, `\s+` split, "" → one empty token);
  *  - `top_bigram_count` — the multiplicity of the doc's most frequent
  *    token 2-gram (0 when the doc has no 2-gram);
  *  - `distinct_trigrams` — distinct token 3-grams (0 when none).
  *
  * The derived fractions ([[TextAnalysis.topBigramFrac]] /
  * [[TextAnalysis.dupTrigramFrac]]) are plain column arithmetic over this
  * struct. A relational formulation (explode 2-grams → count per (doc,
  * gram) → max per doc) costs two shuffles on a fan-out of the whole
  * corpus; this is a narrow per-row projection inside the scan — zero
  * shuffle at any scale — because the statistics only ever aggregate
  * WITHIN a document.
  *
  * Stays CodegenFallback deliberately (r17-reviewed): struct-returning
  * codegen is invasive and q_repetition shows no measured dispatch
  * pathology (~0.2 s wall, stable floor) — same reasoning as
  * [[TextProfile]], unlike the array kernels converted in r17.
  */
case class RepetitionProfile(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"repetition_profile requires string, got $t")
    }

  override def dataType: DataType = RepetitionProfile.schema

  override protected def nullSafeEval(input: Any): Any = {
    val tokens = Tokenize.tokens(input.toString)
    val n = tokens.length
    var topBigram = 0L
    if (n >= 2) {
      val counts = new java.util.HashMap[String, Long](n * 2)
      var i = 0
      while (i < n - 1) {
        val g = tokens(i) + " " + tokens(i + 1)
        val c = counts.merge(g, 1L, (a, b) => a + b)
        if (c > topBigram) topBigram = c
        i += 1
      }
    }
    var distinctTri = 0L
    if (n >= 3) {
      val seen = new java.util.HashSet[String](n * 2)
      var i = 0
      while (i < n - 2) {
        if (seen.add(tokens(i) + " " + tokens(i + 1) + " " + tokens(i + 2)))
          distinctTri += 1
        i += 1
      }
    }
    new GenericInternalRow(Array[Any](n.toLong, topBigram, distinctTri))
  }

  override protected def withNewChildInternal(newChild: Expression): RepetitionProfile =
    copy(child = newChild)
}

object RepetitionProfile {
  val schema: StructType = StructType(Seq(
    StructField("n_tokens", LongType, nullable = false),
    StructField("top_bigram_count", LongType, nullable = false),
    StructField("distinct_trigrams", LongType, nullable = false)))

  def apply(c: Column): Column =
    GraftColumnBridge.column(RepetitionProfile(GraftColumnBridge.expression(c)))
}
