package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

import graft.core.GaleChurch

/** Static entry point referenced from generated code. */
object AlignOps {
  /** [[GaleChurch.align]] lifted to Catalyst array data. */
  def galeChurch(a: ArrayData, b: ArrayData): ArrayData = {
    val blocks = GaleChurch.align(a.toIntArray(), b.toIntArray())
    new GenericArrayData(blocks.map(bl =>
      InternalRow(bl.ai, bl.bi, bl.na, bl.nb)): Array[Any])
  }
}

/** `gale_church(lens_a array<int>, lens_b array<int>) →
  * array<struct<ai int, bi int, na int, nb int>>` — the exact-integer
  * Gale–Church sentence aligner ([[graft.core.GaleChurch]]) as a
  * codegen'd scalar: one DP per candidate document pair, stateless, no
  * shuffle. The caller is expected to have gated pairs through the q175
  * length-ratio prior first (the paper's own pipeline order).
  */
case class GaleChurchAlign(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("ai", IntegerType, nullable = false),
    StructField("bi", IntegerType, nullable = false),
    StructField("na", IntegerType, nullable = false),
    StructField("nb", IntegerType, nullable = false))), containsNull = false)
  override def inputTypes: Seq[DataType] =
    Seq(ArrayType(IntegerType), ArrayType(IntegerType))
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "gale_church"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    AlignOps.galeChurch(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.AlignOps.galeChurch($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): GaleChurchAlign =
    copy(left = newLeft, right = newRight)
}
