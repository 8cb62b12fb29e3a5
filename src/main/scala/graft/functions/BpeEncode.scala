package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Rank-ordered BPE encoding of a document: whitespace words
  * ([[Tokenize]]'s shared prologue) each encoded by applying the learned
  * merges in rank order ([[Bpe.encode]]), pieces flattened in document
  * order. The merge list is the model — it rides into generated code as a
  * reference object (the [[GreedySubwords]]/[[HashedBagLinear]] pattern),
  * so encoding is a narrow in-scan projection: zero shuffle, the corpus
  * never moves. This is the standard BPE apply; [[GreedySubwords]] is the
  * WordPiece-style greedy alternative — the two diverge on nested pieces
  * and both are oracle-gated.
  */
case class BpeEncode(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression {

  require(merges.nonEmpty && merges.forall(m => m._1.nonEmpty && m._2.nonEmpty),
    "bpe_encode: merges must be non-empty symbol pairs")

  // compact plan rendering: a 32k-merge model must not inline into every
  // explain/UI string (see NearestCentroid.stringArgs)
  override def stringArgs: Iterator[Any] =
    Iterator(child, s"<${merges.size} merges>")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"bpe_encode requires string, got $t")
    }

  @transient private lazy val model: Array[(String, String)] = merges.toArray

  override protected def nullSafeEval(input: Any): Any =
    BpeEncode.compute(input.toString, model)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val m = ctx.addReferenceObj("merges", model,
        classOf[Array[(String, String)]].getName)
      s"${ev.value} = graft.functions.BpeEncode.compute($c.toString(), $m);"
    })

  override protected def withNewChildInternal(newChild: Expression): BpeEncode =
    copy(child = newChild)
}

object BpeEncode {

  def compute(s: String, merges: Array[(String, String)]): GenericArrayData = {
    val pieces = scala.collection.mutable.ArrayBuffer.empty[Any]
    Tokenize.tokens(s).foreach { word =>
      Bpe.encode(word, merges).foreach(p => pieces += UTF8String.fromString(p))
    }
    new GenericArrayData(pieces.toArray)
  }

  def apply(c: Column, merges: Seq[(String, String)]): Column =
    GraftColumnBridge.column(
      BpeEncode(GraftColumnBridge.expression(c), merges))
}
