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
  * order. The merge model rides into generated code as a pre-indexed
  * [[Bpe.RankIndex]] reference object (the
  * [[GreedySubwords]]/[[NearestCentroid]] pattern — a named model class,
  * never a raw `Array[(…)]` whose JVM binary name `[L…;` is not valid Java
  * source and would break codegen compilation), so encoding is a narrow
  * in-scan projection: zero shuffle, the corpus never moves, and per-word
  * cost is O(|word| log |word|) independent of merge count.
  *
  * Two edge rules, both mirrored by the oracle: an EMPTY merge list is
  * legal and degenerates to per-codepoint symbols (a corpus can exhaust
  * its pairs before learning a single merge); and words containing the
  * reserved trainer delimiter U+0001 — which [[Bpe.lexicon]] excludes from
  * training on both sides — take no merges and emit bare codepoints, so a
  * content control char can never diverge engine from replay.
  * [[GreedySubwords]] is the WordPiece-style greedy alternative — the two
  * diverge on nested pieces and both are oracle-gated.
  */
case class BpeEncode(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression {

  require(merges.forall(m => m._1.nonEmpty && m._2.nonEmpty),
    "bpe_encode: merges must be pairs of non-empty symbols")
  // duplicate pairs rejected HERE, at plan construction on the driver —
  // [[Bpe.RankIndex]] re-checks, but `model` is transient-lazy and would
  // only fire at first eval, turning a caller bug into a mid-job task
  // failure instead of an immediate analysis-time error (see RankIndex's
  // doc for why duplicates are unrepresentable rather than first-wins)
  require(merges.distinct.length == merges.length,
    "bpe_encode: merges must not contain duplicate pairs")

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

  @transient private lazy val model: Bpe.RankIndex =
    new Bpe.RankIndex(merges.toArray)

  override protected def nullSafeEval(input: Any): Any =
    BpeEncode.compute(input.toString, model)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val m = ctx.addReferenceObj("bpeIndex", model,
        classOf[Bpe.RankIndex].getName)
      s"${ev.value} = graft.functions.BpeEncode.compute($c.toString(), $m);"
    })

  override protected def withNewChildInternal(newChild: Expression): BpeEncode =
    copy(child = newChild)
}

object BpeEncode {

  def compute(s: String, index: Bpe.RankIndex): GenericArrayData = {
    val pieces = scala.collection.mutable.ArrayBuffer.empty[Any]
    Tokenize.tokens(s).foreach { word =>
      if (word.indexOf('\u0001') >= 0) {
        // reserved trainer delimiter in content: excluded from training,
        // excluded from merging — bare codepoints, same as the oracle
        word.codePoints().forEach(cp =>
          pieces += UTF8String.fromString(new String(Character.toChars(cp))))
      } else {
        Bpe.encode(word, index).foreach(p => pieces += UTF8String.fromString(p))
      }
    }
    new GenericArrayData(pieces.toArray)
  }

  def apply(c: Column, merges: Seq[(String, String)]): Column =
    GraftColumnBridge.column(
      BpeEncode(GraftColumnBridge.expression(c), merges))
}
