package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** MinHash signature of a shingle set, as one custom Catalyst expression:
  * a single pass over the shingle array updating a primitive long[numHashes]
  * accumulator — no per-shingle array copies, no shuffle, no interpreted
  * higher-order-function lambdas (the `aggregate`/`zip_with` formulation
  * measured 3× slower than even the explode+groupBy one).
  *
  * Hash family: seed-mixed splitmix64 finalization of one base byte hash —
  * see [[MinHashSig.signature]] for why a cheaper linear h₁+i·h₂ family is
  * NOT usable here (correlated minhashes break LSH band recall).
  *
  * Real doGenCode (a static call into the shared kernel) rather than
  * CodegenFallback: the fallback's megamorphic `eval` dispatch made C2
  * devirtualization a per-JVM coin flip on the simhash twin (2× converged
  * task-cpu modes, r17 TSV diagnosis) — a monomorphic static call site
  * compiles the same way every run.
  */
case class MinHashSig(child: Expression, numHashes: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"minhash_sig requires array<string>, got $t")
  }

  override protected def nullSafeEval(input: Any): Any =
    MinHashSig.sigData(input.asInstanceOf[ArrayData], numHashes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.MinHashSig.sigData($c, $numHashes);")

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

/** LSH band keys straight from the shingle set: one 64-bit FNV hash per band
  * of `rowsPerBand` consecutive minhashes — skips materializing the signature
  * and the interpreted slice/concat lambdas (measured 3.4 s → negligible on
  * 5k docs × 32 bands). Output: ARRAY<LONG>, one key per band; band index =
  * array position.
  */
case class MinHashBandKeys(child: Expression, numHashes: Int, bands: Int)
    extends UnaryExpression {
  require(numHashes % bands == 0, "numHashes must divide into bands")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"minhash_bands requires array<string>, got $t")
  }

  override protected def nullSafeEval(input: Any): Any =
    MinHashBandKeys.compute(input.asInstanceOf[ArrayData], numHashes, bands)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.MinHashBandKeys.compute($c, $numHashes, $bands);")

  override protected def withNewChildInternal(newChild: Expression): MinHashBandKeys =
    copy(child = newChild)
}

object MinHashBandKeys {

  /** The per-row kernel, shared by interpreted eval and generated code. */
  def compute(arr: ArrayData, numHashes: Int, bands: Int): ArrayData = {
    // shingle-less docs get NO band keys (posexplode then drops the row):
    // an all-MaxValue signature would collide in every band and send every
    // short doc into one quadratic bucket
    if (arr.numElements() == 0) return new GenericArrayData(Array.empty[Long])
    val sig = MinHashSig.signature(arr, numHashes)
    val rowsPerBand = numHashes / bands
    val keys = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var h = 0xcbf29ce484222325L
      var i = 0
      while (i < rowsPerBand) {
        val v = sig(b * rowsPerBand + i)
        var k = 0
        while (k < 8) { h ^= (v >>> (8 * k)) & 0xffL; h *= 0x100000001b3L; k += 1 }
        i += 1
      }
      keys(b) = h
      b += 1
    }
    new GenericArrayData(keys)
  }

  def apply(c: Column, numHashes: Int, bands: Int): Column =
    GraftColumnBridge.column(
      MinHashBandKeys(GraftColumnBridge.expression(c), numHashes, bands))
}

object MinHashSig {

  /** [[signature]] wrapped for the expression surfaces (interpreted eval and
    * generated code both call this static entry point).
    */
  def sigData(arr: ArrayData, numHashes: Int): ArrayData =
    new GenericArrayData(signature(arr, numHashes))

  /** One pass over the shingle array into a primitive long[numHashes] min.
    * Per-seed independence matters: a linear h₁+i·h₂ family makes the 128
    * minhashes correlated (the i·h₂ term dominates the argmin for large i),
    * which measurably breaks LSH band recall even at jaccard ≥ 0.8. Each
    * seed therefore gets a full splitmix64 finalization of h(x) XOR seedᵢ.
    */
  private[functions] def signature(arr: ArrayData, numHashes: Int): Array[Long] = {
    val acc = Array.fill(numHashes)(Long.MaxValue)
    var j = 0
    while (j < arr.numElements()) {
      val s = arr.getUTF8String(j)
      if (s != null) {
        val h = hash64(s)
        var i = 0
        while (i < numHashes) {
          var z = h ^ (i.toLong * 0x9e3779b97f4a7c15L)
          z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
          z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
          z ^= (z >>> 31)
          if (z < acc(i)) acc(i) = z
          i += 1
        }
      }
      j += 1
    }
    acc
  }

  /** FNV-1a 64-bit over the UTF-8 bytes (engine-local; no oracle-parity
    * requirement — LSH output is verified against exact Jaccard).
    */
  private[functions] def hash64(s: UTF8String): Long = {
    val bytes = s.getBytes
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < bytes.length) {
      h ^= (bytes(i) & 0xffL)
      h *= 0x100000001b3L
      i += 1
    }
    h
  }

  def apply(c: Column, numHashes: Int): Column =
    GraftColumnBridge.column(MinHashSig(GraftColumnBridge.expression(c), numHashes))
}
