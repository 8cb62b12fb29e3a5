package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Polynomial rolling-hash document fingerprint, as a native Catalyst
  * expression with whole-stage codegen (preferred over a Scala UDF — stays
  * inside the generated loop, no boxing/serialization).
  *
  * hash = fold(31·acc + codepoint) mod 2^31−1 over the string's code points.
  * The modulus keeps the accumulator in positive 63-bit range so the exact
  * same arithmetic is expressible in the DuckDB oracle
  * (`list_reduce(codepoints, (a, b) -> (a*31+b) % 2147483647)`).
  */
case class PolyHash(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def checkInputDataTypes() =
    if (child.dataType == StringType) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"polyhash requires a string input, got ${child.dataType}")

  override protected def nullSafeEval(input: Any): Any =
    PolyHash.eval(input.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val str = ctx.freshName("str")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |String $str = $c.toString();
         |long $acc = 0L;
         |for (int $i = 0; $i < $str.length(); ) {
         |  int cp = $str.codePointAt($i);
         |  $acc = ($acc * 31L + (long) cp) % 2147483647L;
         |  $i += Character.charCount(cp);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): PolyHash = copy(newChild)
}

object PolyHash {
  final val Mod = 2147483647L // 2^31 − 1

  def eval(s: String): Long = {
    var acc = 0L
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      acc = (acc * 31L + cp) % Mod
      i += Character.charCount(cp)
    }
    acc
  }

  /** Column API: `poly_hash($"text")`. */
  def apply(c: Column): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(PolyHash(GraftColumnBridge.expression(c)))
  }
}
