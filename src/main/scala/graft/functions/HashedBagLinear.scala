package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}

/** fastText-style hashed bag-of-tokens linear scorer — the shape of the
  * model-based quality classifiers pretraining pipelines run over every
  * document (Joulin et al. 2016; the CCNet / LLaMA "quality filter"): each
  * token hashes into one of `weights.length` buckets, the document's score
  * is the MEAN of its tokens' bucket weights plus a bias, and the
  * probability is the sigmoid of that logit. With one output class the
  * whole model is a weight-per-bucket vector, so inference is a narrow
  * in-scan projection — no shuffle, no join, no vectorized model server —
  * which is the only shape that prices out at 100 TB: the model broadcasts
  * inside the expression (a reference object in generated code) and the
  * corpus never moves.
  *
  * Emits the LOGIT (`bias + Σ w[h(tok) mod B] / n_tokens`), not the
  * sigmoid: downstream keep-decisions threshold in logit space
  * (sigmoid is monotone), and the linear form is exactly replayable by
  * the DuckDB oracle — same 31-poly token hash as [[PolyHash]], same
  * left-to-right fold, so the doubles are bit-identical with no
  * cross-engine `exp` in the gate. [[TextAnalysis.classifierScore]]
  * applies the sigmoid for callers that want a probability.
  *
  * Tokenization is [[Tokenize]] (shared with TextProfile et al.): ""
  * yields one empty token, which hashes to bucket 0 with `PolyHash("")`
  * = 0 — so `n_tokens` ≥ 1 always and the mean never divides by zero.
  */
case class HashedBagLinear(child: Expression, weights: Seq[Double], bias: Double)
    extends UnaryExpression {

  require(weights.nonEmpty, "hashed_bag_logit: weights must be non-empty")

  // compact plan rendering: the bucket-weight vector must not inline into
  // every explain/UI string (see NearestCentroid.stringArgs)
  override def stringArgs: Iterator[Any] =
    Iterator(child, s"<${weights.size} bucket weights>", bias)

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"hashed_bag_logit requires string, got $t")
    }

  @transient private lazy val weightArr: Array[Double] = weights.toArray

  override protected def nullSafeEval(input: Any): Any =
    HashedBagLinear.compute(input.toString, weightArr, bias)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      // the model rides into generated code as a reference object — the
      // in-process analog of a broadcast: one array per executor, zero
      // per-row allocation
      val w = ctx.addReferenceObj("weights", weightArr, "double[]")
      s"${ev.value} = graft.functions.HashedBagLinear.compute($c.toString(), $w, $bias);"
    })

  override protected def withNewChildInternal(newChild: Expression): HashedBagLinear =
    copy(child = newChild)
}

object HashedBagLinear {

  /** One pass over the document: tokenize, hash each token with the
    * PolyHash recurrence, fold bucket weights left-to-right (the fold
    * order is part of the contract — the oracle replays it), mean, bias.
    */
  def compute(s: String, w: Array[Double], bias: Double): Double = {
    val tokens = Tokenize.tokens(s)
    var sum = 0.0
    var i = 0
    while (i < tokens.length) {
      sum += w((PolyHash.eval(tokens(i)) % w.length).toInt)
      i += 1
    }
    bias + sum / tokens.length
  }

  def apply(c: Column, weights: Array[Double], bias: Double): Column =
    GraftColumnBridge.column(
      HashedBagLinear(GraftColumnBridge.expression(c), weights.toSeq, bias))
}
