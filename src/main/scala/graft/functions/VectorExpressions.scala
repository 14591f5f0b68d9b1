package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Native codegen'd vector kernels (SURVEY.md §4.3 path (b)).
  *
  * Why not `functions.aggregate(zip_with(...))`: Catalyst's higher-order
  * functions are CodegenFallback — every row pays interpreted lambda
  * dispatch per ELEMENT, and the expression fences the surrounding
  * WholeStageCodegen stage. These expressions compile to a single static
  * call over the columnar `ArrayData`, keep the stage fused, and do one
  * pass per row (the fused cosine reads both arrays once for all three
  * accumulators instead of three aggregate passes).
  *
  * Numeric contract: ALL kernels fold left in index order — exactly the
  * summation order of `aggregate(zip_with(..))` — so swapping them into an
  * oracle-checked query cannot move a value. Null contract likewise
  * matches the higher-order composition: any null element or a length
  * mismatch yields NULL (zip_with pads/propagates null, aggregate's `+`
  * then nulls the fold).
  */
object VecOps {
  def dot(a: ArrayData, b: ArrayData): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var s = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      s += a.getDouble(i) * b.getDouble(i)
      i += 1
    }
    java.lang.Double.valueOf(s)
  }

  /** Fused cosine: Σab / (√Σaa · √Σbb), one pass over both arrays. */
  def cos(a: ArrayData, b: ArrayData): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var sab = 0.0; var saa = 0.0; var sbb = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = a.getDouble(i); val y = b.getDouble(i)
      sab += x * y; saa += x * x; sbb += y * y
      i += 1
    }
    java.lang.Double.valueOf(sab / (math.sqrt(saa) * math.sqrt(sbb)))
  }

  def sqdist(a: ArrayData, b: ArrayData): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var s = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val d = a.getDouble(i) - b.getDouble(i)
      s += d * d
      i += 1
    }
    java.lang.Double.valueOf(s)
  }

  def norm(a: ArrayData): java.lang.Double = {
    val n = a.numElements()
    var s = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i)) return null
      val x = a.getDouble(i)
      s += x * x
      i += 1
    }
    java.lang.Double.valueOf(math.sqrt(s))
  }
}

private[functions] trait VecBinary extends BinaryExpression with ExpectsInputTypes {
  override def dataType: DataType = DoubleType
  override def inputTypes: Seq[DataType] =
    Seq(ArrayType(DoubleType), ArrayType(DoubleType))
  override def nullable: Boolean = true
  /** Name of the [[VecOps]] static the kernel calls. */
  def kernel: String

  override protected def nullSafeEval(a: Any, b: Any): Any = kernel match {
    case "dot" => VecOps.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    case "cos" => VecOps.cos(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    case "sqdist" => VecOps.sqdist(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val tmp = ctx.freshName("vecr")
      s"""java.lang.Double $tmp = graft.functions.VecOps.$kernel($a, $b);
         |if ($tmp == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $tmp.doubleValue(); }""".stripMargin
    })
}

/** `vec_dot(a, b)` — Σ aᵢbᵢ. */
case class VecDot(left: Expression, right: Expression) extends VecBinary {
  override def prettyName: String = "vec_dot"
  override def kernel: String = "dot"
  override protected def withNewChildrenInternal(l: Expression, r: Expression): VecDot =
    copy(left = l, right = r)
}

/** `vec_cos(a, b)` — cosine similarity, single fused pass. */
case class VecCos(left: Expression, right: Expression) extends VecBinary {
  override def prettyName: String = "vec_cos"
  override def kernel: String = "cos"
  override protected def withNewChildrenInternal(l: Expression, r: Expression): VecCos =
    copy(left = l, right = r)
}

/** `vec_sqdist(a, b)` — squared L2 distance. */
case class VecSqDist(left: Expression, right: Expression) extends VecBinary {
  override def prettyName: String = "vec_sqdist"
  override def kernel: String = "sqdist"
  override protected def withNewChildrenInternal(l: Expression, r: Expression): VecSqDist =
    copy(left = l, right = r)
}

/** `vec_norm(a)` — L2 norm (√Σaᵢ², identical to sqrt(vec_dot(a,a))). */
case class VecNorm(child: Expression) extends UnaryExpression with ExpectsInputTypes {
  override def dataType: DataType = DoubleType
  override def inputTypes: Seq[DataType] = Seq(ArrayType(DoubleType))
  override def nullable: Boolean = true
  override def prettyName: String = "vec_norm"

  override protected def nullSafeEval(a: Any): Any =
    VecOps.norm(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val tmp = ctx.freshName("vecr")
      s"""java.lang.Double $tmp = graft.functions.VecOps.norm($a);
         |if ($tmp == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $tmp.doubleValue(); }""".stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): VecNorm =
    copy(child = newChild)
}

/** Sorted-set kernels over BIGINT arrays (the q116/q212 candidate-verify
  * hot path). `size(array_intersect(a, b))` allocates an OpenHashSet AND
  * the materialized intersection array per row; for arrays that are
  * already sorted and distinct, a linear merge computes the same count
  * with zero allocation.
  */
object IntSetOps {
  /** |A∩B| of two SORTED ASC, element-distinct long arrays by linear
    * merge. Null element → null (matches array_intersect's null
    * sensitivity for the arrays this engine feeds it — none carry null
    * elements).
    */
  def sortedInterCount(a: ArrayData, b: ArrayData): java.lang.Long = {
    val na = a.numElements(); val nb = b.numElements()
    var i = 0; var j = 0; var c = 0L
    while (i < na && j < nb) {
      if (a.isNullAt(i) || b.isNullAt(j)) return null
      val x = a.getLong(i); val y = b.getLong(j)
      if (x == y) { c += 1L; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    java.lang.Long.valueOf(c)
  }
}

/** `sorted_inter_count(a, b)` — |A∩B| of two sorted-distinct BIGINT
  * arrays, single merge pass, no per-row allocation.
  */
case class SortedInterCount(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {
  override def dataType: DataType = LongType
  override def inputTypes: Seq[DataType] =
    Seq(ArrayType(LongType), ArrayType(LongType))
  override def nullable: Boolean = true
  override def prettyName: String = "sorted_inter_count"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    IntSetOps.sortedInterCount(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val tmp = ctx.freshName("interc")
      s"""java.lang.Long $tmp = graft.functions.IntSetOps.sortedInterCount($a, $b);
         |if ($tmp == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $tmp.longValue(); }""".stripMargin
    })

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): SortedInterCount =
    copy(left = l, right = r)
}
