package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Sign-random-hyperplane LSH band keys over an `ARRAY<FLOAT|DOUBLE>`
  * embedding, in one pass per row (the [[MinHashBandKeys]] shape for the
  * cosine metric): bit i of the sketch is the sign of a Rademacher
  * projection Σ_d s(i,d)·v_d with s(i,d) ∈ {−1,+1} drawn deterministically
  * from splitmix64(i·dim ⊕ d) — seedless, so every executor and every run
  * sketches identically. Bits are packed `numBits/bands` per band into one
  * long key; the caller equi-joins on (band, key) and verifies candidates
  * with exact cosine.
  *
  * Collision probability per bit for a pair at angle θ is 1 − θ/π
  * (Charikar '02), so this family is only selective at high cosine — the
  * exact grid join [[Similarity.cosinePairs]] covers the low-threshold
  * regime.
  */
case class SignBandKeys(child: Expression, numBits: Int, bands: Int)
    extends UnaryExpression {
  require(numBits % bands == 0, "numBits must divide into bands")
  require(numBits / bands <= 63, "band key must fit a long")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  private def elemType: Option[DataType] = child.dataType match {
    case ArrayType(t @ (FloatType | DoubleType), _) => Some(t)
    case _ => None
  }

  override def checkInputDataTypes(): TypeCheckResult = elemType match {
    case Some(_) => TypeCheckResult.TypeCheckSuccess
    case None => TypeCheckResult.TypeCheckFailure(
      s"sign_band_keys requires array<float|double>, got ${child.dataType}")
  }

  private def isFloat: Boolean = elemType.contains(FloatType)

  override protected def nullSafeEval(input: Any): Any =
    SignBandKeys.compute(input.asInstanceOf[ArrayData], isFloat, numBits, bands)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.SignBandKeys.compute($c, $isFloat, $numBits, $bands);")

  override protected def withNewChildInternal(newChild: Expression): SignBandKeys =
    copy(child = newChild)
}

object SignBandKeys {

  /** The per-row kernel, shared by interpreted eval and generated code;
    * `isFloat` is resolved from the child's element type at plan time.
    */
  def compute(arr: ArrayData, isFloat: Boolean, numBits: Int, bands: Int): ArrayData = {
    val dim = arr.numElements()
    if (dim == 0) return new GenericArrayData(Array.empty[Long])
    val rowsPerBand = numBits / bands
    val keys = new Array[Long](bands)
    var bit = 0
    while (bit < numBits) {
      var acc = 0.0
      var d = 0
      while (d < dim) {
        // splitmix64 of the (bit, dim) cell index; LSB → ±1
        var z = (bit.toLong * dim + d) + 0x9e3779b97f4a7c15L
        z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
        z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
        z ^= (z >>> 31)
        val sign = if ((z & 1L) == 0L) 1.0 else -1.0
        val v = if (isFloat) arr.getFloat(d).toDouble else arr.getDouble(d)
        acc += sign * v
        d += 1
      }
      if (acc > 0) keys(bit / rowsPerBand) |= 1L << (bit % rowsPerBand)
      bit += 1
    }
    new GenericArrayData(keys)
  }

  def apply(c: Column, numBits: Int, bands: Int): Column =
    GraftColumnBridge.column(
      SignBandKeys(GraftColumnBridge.expression(c), numBits, bands))
}
