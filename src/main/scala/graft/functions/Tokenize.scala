package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** THE tokenization every custom text expression uses, in one place:
  * space-only trim (Spark `trim` semantics — NOT Java `String.trim`,
  * which also strips control chars like \n and \t) followed by a
  * whitespace-run split with limit −1 (keeps trailing empty tokens, like
  * Spark `split` / DuckDB `string_split_regex`; splitting "" yields one
  * empty token). The DuckDB oracles pin these semantics character by
  * character, and the custom expressions ([[TextProfile]],
  * [[WordShingles]], [[RepetitionProfile]], …) share them —
  * re-implementing the prologue per expression is how a subtle
  * edge-whitespace divergence slips into ONE of them and breaks
  * cross-expression parity with no compile error.
  */
private[functions] object Tokenize {

  def trimmed(s: String): String = {
    var from = 0
    var to = s.length
    while (from < to && s.charAt(from) == ' ') from += 1
    while (to > from && s.charAt(to - 1) == ' ') to -= 1
    s.substring(from, to)
  }

  /** Java-regex `\s`: [ \t\n\u000B\f\r]. (RE2's `\s` — the DuckDB oracle
    * side — omits U+000B (vertical tab); the sets agree on every character real text
    * contains, and the Spark side has always used the Java set via
    * `split("\\s+")`, so this scanner preserves behavior exactly.)
    */
  private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'

  /** `trimmed(s).split("\\s+", -1)`, hand-rolled. String.split (and
    * Spark's split(), which reaches the same machinery) re-compiles the
    * regex on EVERY call — only single-char non-regex patterns take the
    * fast path — and this prologue runs per row in every text
    * expression, so the compile was a per-row tax across the whole
    * family. Semantics are pinned by a generative spec against the regex
    * form: leading separator → one leading empty token, runs collapse,
    * trailing separator → one trailing empty token (limit −1), "" → [""].
    */
  def tokens(s: String): Array[String] = {
    val t = trimmed(s)
    val n = t.length
    if (n == 0) return Array("")
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    var start = 0
    while (i < n) {
      if (isWs(t.charAt(i))) {
        out += t.substring(start, i)
        i += 1
        while (i < n && isWs(t.charAt(i))) i += 1
        start = i
      } else i += 1
    }
    out += t.substring(start, n)
    out.toArray
  }
}

/** `trim` + `\s+`-split as ONE codegen expression — the DataFrame-level
  * twin of [[Tokenize.tokens]], so `TextAnalysis.tokens` and every custom
  * expression tokenize through literally the same scanner and can never
  * diverge. Replaces `split(trim(text), "\\s+")`, whose regex is
  * re-compiled per row.
  */
case class WhitespaceTokens(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"whitespace_tokens requires string, got $t")
    }

  override protected def nullSafeEval(input: Any): Any =
    WhitespaceTokens.compute(input.toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.WhitespaceTokens.compute($c.toString());")

  override protected def withNewChildInternal(newChild: Expression): WhitespaceTokens =
    copy(child = newChild)
}

object WhitespaceTokens {

  def compute(s: String): GenericArrayData = {
    val toks = Tokenize.tokens(s)
    val out = new Array[Any](toks.length)
    var i = 0
    while (i < toks.length) { out(i) = UTF8String.fromString(toks(i)); i += 1 }
    new GenericArrayData(out)
  }

  def apply(c: Column): Column =
    GraftColumnBridge.column(WhitespaceTokens(GraftColumnBridge.expression(c)))
}
