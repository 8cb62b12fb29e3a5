package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.{array, col}
import org.apache.spark.sql.types._

/** Morton (Z-order) interleaving key for multi-dimension data layout —
  * the `OPTIMIZE ZORDER BY` primitive: writing files in z-key ranges
  * gives every file a tight min/max envelope on EVERY interleaved
  * dimension at once, so a multi-dimension box predicate prunes files
  * (parquet file/row-group stats) instead of scanning the table. A
  * single-column sort gives that property to one dimension only; at
  * 100 TB the difference is reading a multi-dimension cell vs a full
  * dimension slice.
  *
  * Takes the dimensions as one `array<long>` (the Column API builds it
  * with codegen'd `CreateArray`, so the whole key stays in the generated
  * scan loop). `bits` low bits of each element interleave round-robin
  * (element 0 at the lowest position); elements are masked to `bits`, so
  * callers bucket raw values into [0, 2^bits) first (range-rank or
  * modulo) and an out-of-range value WRAPS rather than corrupting
  * neighbors' bits. A null element nulls the key. `dims × bits ≤ 63`
  * keeps the key a positive long; the arithmetic is shifts-and-ors,
  * replayed bit-exactly by the DuckDB oracle.
  */
case class ZOrderKey(child: Expression, bits: Int) extends UnaryExpression {

  require(bits > 0 && bits <= 63, s"zorder_key: bits must be in [1, 63], got $bits")

  override def dataType: DataType = LongType

  // a null ELEMENT nulls the key even when the array itself is non-null
  // (CreateArray is) — without this Spark folds isNull to a constant and
  // the element check cannot propagate
  override def nullable: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"zorder_key requires array<long> (cast dimensions to long), got $t")
    }

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    if (ZOrderKey.hasNull(arr)) null else ZOrderKey.compute(arr, bits)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |if (graft.functions.ZOrderKey.hasNull($c)) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = graft.functions.ZOrderKey.compute($c, $bits);
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): ZOrderKey =
    copy(child = newChild)
}

object ZOrderKey {

  def hasNull(arr: ArrayData): Boolean = {
    var i = 0
    while (i < arr.numElements()) {
      if (arr.isNullAt(i)) return true
      i += 1
    }
    false
  }

  /** Bit i of element d lands at position i*dims + d. */
  def interleave(vals: Array[Long], bits: Int): Long = {
    val dims = vals.length
    if (dims.toLong * bits > 63)
      throw new IllegalArgumentException(
        s"zorder_key: dims ($dims) * bits ($bits) must be <= 63")
    var z = 0L
    var d = 0
    while (d < dims) {
      val v = vals(d) & ((1L << bits) - 1)
      var i = 0
      while (i < bits) {
        z |= ((v >> i) & 1L) << (i * dims + d)
        i += 1
      }
      d += 1
    }
    z
  }

  def compute(arr: ArrayData, bits: Int): Long = {
    val vals = new Array[Long](arr.numElements())
    var d = 0
    while (d < vals.length) { vals(d) = arr.getLong(d); d += 1 }
    interleave(vals, bits)
  }

  /** Column API: `ZOrderKey(Seq($"x", $"y"), bits)` — dimensions are cast
    * to long and packed with codegen'd CreateArray.
    */
  def apply(cols: Seq[Column], bits: Int): Column =
    GraftColumnBridge.column(ZOrderKey(
      GraftColumnBridge.expression(array(cols.map(_.cast("long")): _*)), bits))
}

object ZOrder {

  /** Lay a table out in z-key range order: range-partition into
    * `numFiles` z-ranges and sort within each — ONE range shuffle, after
    * which every written file covers a contiguous z interval (and
    * therefore a tight per-dimension min/max envelope). Callers write
    * the result with plain `.write.parquet`; at scale `numFiles` is the
    * target file count (corpus bytes / a few GB).
    */
  def layout(df: DataFrame, cols: Seq[String], bits: Int,
      numFiles: Int): DataFrame = {
    // the Salting.__salt guard: withColumn would silently REPLACE a caller's
    // pre-existing __zkey (e.g. a previously laid-out table that kept its
    // key) and the drop below would then remove the caller's column
    require(!df.columns.contains("__zkey"),
      "ZOrder.layout: input already has a __zkey column — rename or drop it first")
    df.withColumn("__zkey", ZOrderKey(cols.map(col), bits))
      .repartitionByRange(numFiles, col("__zkey"))
      .sortWithinPartitions(col("__zkey"))
      .drop("__zkey")
  }
}
