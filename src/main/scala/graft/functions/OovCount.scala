package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}

/** Count of a document's tokens OUTSIDE a broadcast vocabulary — the
  * hot inner loop of [[TextAnalysis.oovRate]] as a single-pass
  * expression: one tokenization ([[Tokenize]]) and an O(1) hash-set
  * probe per token, with the vocabulary riding into generated code as a
  * reference object (the [[HashedBagLinear]] model pattern). The HOF
  * formulation (`filter(tokens, !isin(vocab))`) evaluates an
  * interpreted 50-literal `In` per token — measured ~3× the cpu of this
  * expression at sf0.1 — and re-splits the text besides.
  */
case class OovCount(child: Expression, vocab: Seq[String])
    extends UnaryExpression {

  require(vocab.nonEmpty, "oov_count: vocab must be non-empty")

  // compact plan rendering: a 1e6-token vocab must not inline into every
  // explain/UI string (see NearestCentroid.stringArgs)
  override def stringArgs: Iterator[Any] =
    Iterator(child, s"<${vocab.size} vocab tokens>")

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"oov_count requires string, got $t")
    }

  @transient private lazy val set: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String](vocab.size * 2)
    vocab.foreach(s.add)
    s
  }

  override protected def nullSafeEval(input: Any): Any =
    OovCount.compute(input.toString, set)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val s = ctx.addReferenceObj("vocabSet", set, "java.util.HashSet")
      s"${ev.value} = graft.functions.OovCount.compute($c.toString(), $s);"
    })

  override protected def withNewChildInternal(newChild: Expression): OovCount =
    copy(child = newChild)
}

object OovCount {

  def compute(s: String, vocab: java.util.HashSet[String]): Long = {
    val tokens = Tokenize.tokens(s)
    var oov = 0L
    var i = 0
    while (i < tokens.length) {
      if (!vocab.contains(tokens(i))) oov += 1
      i += 1
    }
    oov
  }

  def apply(c: Column, vocab: Seq[String]): Column =
    GraftColumnBridge.column(
      OovCount(GraftColumnBridge.expression(c), vocab))
}
