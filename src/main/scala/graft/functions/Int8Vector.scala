package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, TernaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodegenFallback, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Scalar (int8) quantization of an embedding vector: symmetric per-vector
  * scale `max|x| / 127`, codes clamped to [-127, 127]. The quantized form
  * is 4× smaller than fp32 — at 100 TB of embeddings that is the
  * difference between scanning 25 TB and 100 TB per probe pass, which is
  * why ANN serving systems store int8 codes and keep fp32 only for
  * candidate rescoring. Runs ONCE per vector at index-build time (the
  * read-side hot path is [[Int8DotScaled]]), so `CodegenFallback` is the
  * right trade: a struct-returning codegen template buys nothing on a
  * build-once pass.
  */
case class Int8Quantize(child: Expression) extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = Int8Quantize.QuantizedType

  private def elemType: Option[DataType] = child.dataType match {
    case ArrayType(t @ (FloatType | DoubleType), _) => Some(t)
    case _ => None
  }

  override def checkInputDataTypes(): TypeCheckResult = elemType match {
    case Some(_) => TypeCheckResult.TypeCheckSuccess
    case None => TypeCheckResult.TypeCheckFailure(
      s"int8_quantize requires array<float|double> input, got ${child.dataType}")
  }

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val isFloat = elemType.contains(FloatType)
    val n = x.numElements()
    var maxAbs = 0.0
    var i = 0
    while (i < n) {
      val v = math.abs(if (isFloat) x.getFloat(i).toDouble else x.getDouble(i))
      if (v > maxAbs) maxAbs = v
      i += 1
    }
    val scale = (maxAbs / 127.0).toFloat
    val codes = new Array[Byte](n)
    if (scale > 0f) {
      i = 0
      while (i < n) {
        val v = if (isFloat) x.getFloat(i).toDouble else x.getDouble(i)
        val q = Math.round(v / scale)
        codes(i) = math.max(-127L, math.min(127L, q)).toByte
        i += 1
      }
    }
    new GenericInternalRow(Array[Any](codes, scale))
  }

  override protected def withNewChildInternal(c: Expression): Int8Quantize = copy(c)
}

object Int8Quantize {
  /** codes: one int8 per dimension; scale: dequant factor (0 ⇔ zero vector). */
  val QuantizedType: StructType = StructType(Seq(
    StructField("codes", BinaryType, nullable = false),
    StructField("scale", FloatType, nullable = false)))

  def apply(c: Column): Column =
    GraftColumnBridge.column(Int8Quantize(GraftColumnBridge.expression(c)))
}

/** Dequantized dot product `scale · Σ codes[i] · q[i]` between an int8-coded
  * corpus vector and an fp query vector — the ANN probe-scoring hot path,
  * so it stays inside whole-stage codegen: a tight byte[]×double loop per
  * row, no dequantized array materialized. Accumulates Σ codes·q in double
  * and applies the scale once at the end (fewer rounding steps, and
  * bit-reproducible across partitionings).
  */
case class Int8DotScaled(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {

  override def dataType: DataType = DoubleType

  private def queryElemType: Option[DataType] = third.dataType match {
    case ArrayType(t @ (FloatType | DoubleType), _) => Some(t)
    case _ => None
  }

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, queryElemType) match {
      case (BinaryType, FloatType | DoubleType, Some(_)) => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        "int8_dot requires (binary codes, float|double scale, array<float|double> query), got " +
          s"${first.dataType} / ${second.dataType} / ${third.dataType}")
    }

  override def nullSafeEval(codes: Any, scale: Any, query: Any): Any = {
    val c = codes.asInstanceOf[Array[Byte]]
    val q = query.asInstanceOf[ArrayData]
    val isFloat = queryElemType.contains(FloatType)
    val s = second.dataType match {
      case FloatType => scale.asInstanceOf[Float].toDouble
      case _ => scale.asInstanceOf[Double]
    }
    // loud on mismatch (the VectorDot contract): truncating deflates the
    // dequantized dot into a plausible-but-wrong ranking score
    if (c.length != q.numElements())
      throw new IllegalArgumentException(
        s"int8_dot: dimension mismatch ${c.length} vs ${q.numElements()}")
    val n = c.length
    var acc = 0.0
    var i = 0
    while (i < n) {
      val qv = if (isFloat) q.getFloat(i).toDouble else q.getDouble(i)
      acc += c(i).toDouble * qv
      i += 1
    }
    acc * s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (c, s, q) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val getQ =
        if (queryElemType.contains(FloatType)) s"(double) $q.getFloat($i)"
        else s"$q.getDouble($i)"
      s"""
         |if ($c.length != $q.numElements()) {
         |  throw new IllegalArgumentException(
         |    "int8_dot: dimension mismatch " + $c.length + " vs " + $q.numElements());
         |}
         |int $n = $c.length;
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += ((double) $c[$i]) * $getQ;
         |}
         |${ev.value} = $acc * ((double) $s);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): Int8DotScaled = copy(f, s, t)
}

object Int8DotScaled {
  def apply(codes: Column, scale: Column, query: Column): Column =
    GraftColumnBridge.column(Int8DotScaled(
      GraftColumnBridge.expression(codes),
      GraftColumnBridge.expression(scale),
      GraftColumnBridge.expression(query)))
}
