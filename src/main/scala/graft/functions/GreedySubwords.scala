package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Greedy longest-match subword segmentation — WordPiece-style tokenizer
  * INFERENCE (the apply side of the tokenizer lifecycle whose train side
  * is [[TextAnalysis.tokenFrequencies]]): each whitespace word is split
  * left-to-right by always taking the LONGEST vocabulary piece matching
  * at the cursor, falling back to a single character when nothing
  * matches. The vocabulary is the model — it rides into generated code
  * as a reference object (per-executor, first-codepoint-indexed,
  * length-descending), so inference is a narrow in-scan projection: the
  * corpus never moves, exactly like [[HashedBagLinear]].
  *
  * Semantics are defined over Unicode CODE POINTS (DuckDB's substr/len
  * count codepoints; UTF-16 `charAt` would diverge on non-BMP input), and
  * the greedy recurrence is sequential BY NATURE — the oracle replays it
  * with a recursive CTE, the same technique as packGreedy's. Tokenization
  * prologue is [[Tokenize]] ("" → one empty token → zero pieces).
  */
case class GreedySubwords(child: Expression, vocab: Seq[String])
    extends UnaryExpression {

  require(vocab.nonEmpty && vocab.forall(_.nonEmpty),
    "greedy_subwords: vocab must be non-empty strings")

  // compact plan rendering: a 32k-piece vocab must not inline into every
  // explain/UI string (see NearestCentroid.stringArgs)
  override def stringArgs: Iterator[Any] =
    Iterator(child, s"<${vocab.size} vocab pieces>")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"greedy_subwords requires string, got $t")
    }

  @transient private lazy val model: GreedySubwords.Model =
    GreedySubwords.Model(vocab)

  override protected def nullSafeEval(input: Any): Any =
    GreedySubwords.compute(input.toString, model)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val m = ctx.addReferenceObj("vocab", model, classOf[GreedySubwords.Model].getName)
      s"${ev.value} = graft.functions.GreedySubwords.compute($c.toString(), $m);"
    })

  override protected def withNewChildInternal(newChild: Expression): GreedySubwords =
    copy(child = newChild)
}

object GreedySubwords {

  /** Pieces as codepoint arrays, bucketed by first codepoint and ordered
    * longest-first within a bucket (two distinct pieces of equal length
    * cannot both match one position, so no further tiebreak exists).
    */
  case class Model(byFirst: Map[Int, Array[Array[Int]]]) {
    def candidates(cp: Int): Array[Array[Int]] =
      byFirst.getOrElse(cp, Model.Empty)
  }

  object Model {
    private val Empty = Array.empty[Array[Int]]
    def apply(vocab: Seq[String]): Model =
      Model(vocab.distinct.map(_.codePoints().toArray)
        .groupBy(_.head)
        .map { case (c, ps) => c -> ps.sortBy(-_.length).toArray })
  }

  def compute(s: String, m: Model): GenericArrayData = {
    val pieces = scala.collection.mutable.ArrayBuffer.empty[UTF8String]
    Tokenize.tokens(s).foreach { word =>
      val cps = word.codePoints().toArray
      var p = 0
      while (p < cps.length) {
        var taken = 1
        var best: Array[Int] = null
        val cands = m.candidates(cps(p))
        var i = 0
        while (i < cands.length && best == null) {
          val v = cands(i)
          if (v.length <= cps.length - p) {
            var j = 1 // head already matched via the bucket
            while (j < v.length && v(j) == cps(p + j)) j += 1
            if (j == v.length) best = v
          }
          i += 1
        }
        if (best != null) taken = best.length
        pieces += UTF8String.fromString(
          new String(cps, p, taken))
        p += taken
      }
    }
    new GenericArrayData(pieces.toArray[Any])
  }

  def apply(c: Column, vocab: Seq[String]): Column =
    GraftColumnBridge.column(
      GreedySubwords(GraftColumnBridge.expression(c), vocab))
}
