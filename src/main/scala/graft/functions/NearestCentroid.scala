package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Nearest-centroid cell id as a PER-ROW expression over a broadcast
  * centroid set — the assignment shape that scales: the model (k
  * centroids, KBs–MBs) rides into generated code as a reference object,
  * the corpus is touched once in a narrow projection, zero shuffle.
  *
  * The relational formulation ([[Similarity.ivfAssign]]'s
  * corpus × centroids join + per-id argmax aggregation) multiplies the
  * scanned rows by k and — because the argmax struct carries the vector
  * payload — plans a SortAggregate that sorts the k-fold blow-up twice.
  * That cost is tolerable once at index build; per-QUERY assignment (the
  * SemDeDup candidate stage) wants this expression instead. Semantics
  * match `ivfAssign` exactly: cosine with double accumulation in index
  * order, zero-norm/NaN guarded to −2 (below every real cosine), ties
  * broken toward the smaller centroid id.
  */
case class NearestCentroid(child: Expression, centroids: Seq[(Long, Seq[Double])])
    extends UnaryExpression {

  require(centroids.nonEmpty, "nearest_centroid: centroids must be non-empty")

  // plan rendering must not serialize the model: the default stringArgs
  // inlines every centroid component into explain/UI strings — megabytes
  // at a real k. Plan equality (cache lookup, canonicalization) uses the
  // case-class fields and is unaffected.
  override def stringArgs: Iterator[Any] =
    Iterator(child, s"<${centroids.size} centroids, dim ${centroids.head._2.size}>")

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType | DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"nearest_centroid requires array<float|double>, got $t")
    }

  private def elemIsFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  // id-ascending iteration order IS the tiebreak (first strict improvement
  // wins), so sort once here, not per row
  @transient private lazy val model: NearestCentroid.Model =
    NearestCentroid.Model(centroids.sortBy(_._1))

  override protected def nullSafeEval(input: Any): Any =
    NearestCentroid.compute(input.asInstanceOf[ArrayData], elemIsFloat, model)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val m = ctx.addReferenceObj("model", model, classOf[NearestCentroid.Model].getName)
      s"${ev.value} = graft.functions.NearestCentroid.compute($c, $elemIsFloat, $m);"
    })

  override protected def withNewChildInternal(newChild: Expression): NearestCentroid =
    copy(child = newChild)
}

object NearestCentroid {

  /** Pre-sorted centroid matrix with norms computed once at build.
    * `dim` is the single centroid dimensionality — enforced uniform at
    * build, so the per-row mismatch check is ONE comparison, not one per
    * centroid.
    */
  case class Model(ids: Array[Long], vecs: Array[Array[Double]], norms: Array[Double],
      dim: Int)

  object Model {
    def apply(sorted: Seq[(Long, Seq[Double])]): Model = {
      val vecs = sorted.map(_._2.toArray).toArray
      val dim = if (vecs.isEmpty) 0 else vecs(0).length
      require(vecs.forall(_.length == dim),
        s"NearestCentroid: centroid dims differ (expected $dim)")
      Model(sorted.map(_._1).toArray, vecs,
        vecs.map(v => math.sqrt(v.map(x => x * x).sum)), dim)
    }
  }

  def compute(arr: ArrayData, elemIsFloat: Boolean, m: Model): Long = {
    val n = arr.numElements()
    // loud failure on dimension mismatch: truncating the dot to the shorter
    // length would yield plausible-but-wrong cell assignments (the input
    // norm uses all n elements) with no error anywhere. A plain
    // if-throw, NOT require: the executor-hot path runs per row, and
    // require's by-name message allocates a thunk per call without the
    // optimizer (measured as a cpu elevation across the semdedup queries
    // when the check sat inside the centroid loop)
    if (n != m.dim)
      throw new IllegalArgumentException(
        s"NearestCentroid: vector dim $n != centroid dim ${m.dim}")
    var ss = 0.0
    var i = 0
    while (i < n) {
      val x = if (elemIsFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
      ss += x * x
      i += 1
    }
    val nv = math.sqrt(ss)
    var bestSim = Double.NegativeInfinity
    var bestId = m.ids(0)
    var c = 0
    while (c < m.vecs.length) {
      val cv = m.vecs(c)
      var dot = 0.0
      i = 0
      while (i < n) {
        val x = if (elemIsFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
        dot += x * cv(i)
        i += 1
      }
      val den = nv * m.norms(c)
      // safeCosine semantics: zero denominator or NaN ranks below every
      // real cosine, so the tiebreak (first id) decides degenerate rows
      val sim = if (den == 0.0) -2.0 else {
        val s = dot / den
        if (java.lang.Double.isNaN(s)) -2.0 else s
      }
      if (sim > bestSim) { bestSim = sim; bestId = m.ids(c) }
      c += 1
    }
    bestId
  }

  def apply(c: Column, centroids: Seq[(Long, Seq[Double])]): Column =
    GraftColumnBridge.column(
      NearestCentroid(GraftColumnBridge.expression(c), centroids))
}
