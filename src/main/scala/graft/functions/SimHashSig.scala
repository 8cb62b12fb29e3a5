package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** 32-bit SimHash of a token array in one pass — replaces the
  * explode(sequence(0,31)) formulation (32× row inflation plus two
  * aggregation shuffles) with a narrow per-row projection: for each token,
  * bit i of its hash votes +1/−1; signature bit i = sign of the tally.
  *
  * The per-token hash is the oracle-portable 60-bit md5 prefix
  * ([[HashFunctions.portableHash64]]: first 15 hex digits of md5), computed
  * here directly from the digest bytes (big-endian first 8 bytes >>> 4), so
  * the DuckDB oracle reproduces the exact signatures. Tokens keep their
  * multiplicity — repeated words vote repeatedly, like the exploded form.
  *
  * Generates code (a static call into [[SimHashSig.compute]]) rather than
  * extending CodegenFallback: the fallback routes every row through the
  * shared megamorphic `UnaryExpression.eval → nullSafeEval` dispatch, whose
  * devirtualization is a per-JVM profile coin flip — measured as a stable
  * 2× task-cpu bimodality across fresh JVMs on identical work (SimhashProbe,
  * 2026-08-15: steady ~3.3 s vs ~6.0 s modes at sf0.1, constant
  * tasks/stages/input, gc=0). A static call site is monomorphic by
  * construction, so the hot MD5 loop compiles the same way every run.
  */
case class SimHashSig(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"simhash_sig requires array<string>, got $t")
  }

  // empty token arrays produce null (callers filter it), matching the
  // explode-based pipeline where a tokenless doc never reaches the groupBy
  override def nullable: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    SimHashSig.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val sig = ctx.freshName("simhashSig")
      s"""
         |java.lang.Long $sig = graft.functions.SimHashSig.compute($c);
         |if ($sig == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $sig.longValue(); }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SimHashSig =
    copy(child = newChild)
}

object SimHashSig {
  private val digests: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))

  /** The per-row kernel, shared by interpreted eval and generated code.
    * Returns null for an empty token array (see [[SimHashSig.nullable]]).
    */
  def compute(arr: ArrayData): java.lang.Long = {
    val n = arr.numElements()
    if (n == 0) return null
    val votes = new Array[Int](32)
    val md = digests.get()
    var j = 0
    while (j < n) {
      val s = arr.getUTF8String(j)
      if (s != null) {
        md.reset()
        val d = md.digest(s.getBytes)
        // unsigned big-endian first 8 digest bytes, low nibble dropped ==
        // parseLong(hex(md5)[0:15], 16) — the oracle-portable 60-bit hash
        var h = 0L
        var k = 0
        while (k < 8) { h = (h << 8) | (d(k) & 0xffL); k += 1 }
        h >>>= 4
        var bit = 0
        while (bit < 32) {
          votes(bit) += (if (((h >>> bit) & 1L) == 1L) 1 else -1)
          bit += 1
        }
      }
      j += 1
    }
    var sig = 0L
    var bit = 0
    while (bit < 32) {
      if (votes(bit) > 0) sig |= 1L << bit
      bit += 1
    }
    java.lang.Long.valueOf(sig)
  }

  def apply(c: Column): Column =
    GraftColumnBridge.column(SimHashSig(GraftColumnBridge.expression(c)))
}
