package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Rounding helper shared by interpreted and generated code: HALF_UP away
  * from zero, matching both Spark's `round()` (BigDecimal HALF_UP) and
  * DuckDB's `round()` (std::round) so results stay oracle-exact.
  *
  * NOT `floor(v + 0.5)`: that classic shortcut rounds UP at the largest
  * double below a halfway point (JDK-8010430 — `0.49999999999999994 + 0.5`
  * lands exactly on 1.0 after float rounding), where both engines round
  * DOWN. Comparing `v` against `floor(v) + 0.5` is exact — `floor(v)` is
  * an integer and adding 0.5 to an integer below 2^52 is representable —
  * so the three-way compare reproduces true half-away-from-zero. (The
  * fractional-part formulation `v - floor(v)` is NOT exact: the
  * subtraction itself rounds at the same boundary.)
  *
  * Non-finite input throws: the `aggregate(zip_with(round(...)))`
  * formulation this expression replaces errors under ANSI (as does the
  * DuckDB oracle's BIGINT cast) — quantizing NaN to 0 or Infinity to
  * Long.MaxValue would let corrupt embeddings silently join similarity
  * rankings exactly where the oracle gate would have caught them (r12
  * review). */
object QMath {
  def qround(v: Double): Long = {
    if (!java.lang.Double.isFinite(v))
      throw new ArithmeticException(
        s"dot_q: non-finite embedding component $v cannot be quantized " +
        "(the ANSI zip_with/round formulation and the DuckDB oracle both " +
        "reject it)")
    // past Long range the ANSI cast and the DuckDB BIGINT cast both raise
    // — silently saturating to Long.MaxValue would let a corrupt-but-
    // finite component (1e17 at scale 1000) wrap the accumulator while
    // the oracle errors (r12 aggregate review)
    if (v >= 9.223372036854776e18 || v <= -9.223372036854776e18)
      throw new ArithmeticException(
        s"dot_q: quantized component $v overflows BIGINT (the ANSI and " +
        "DuckDB casts both reject it)")
    // at |v| >= 2^52 every double is an integer — nothing to round (and
    // f + 0.5 below would no longer be exact)
    if (math.abs(v) >= 4.503599627370496e15) return v.toLong
    val f = math.floor(v)
    val h = f + 0.5 // exact: f is an integer with |f| <= 2^52
    val r =
      if (v > h) f + 1
      else if (v < h) f
      else if (v >= 0) f + 1 // halfway: away from zero
      else f                 // negative halfway: floor IS away from zero
    r.toLong
  }
}

/** Codegen'd quantized dot product of two float/double array columns:
  * `Σ round(a[i]·scale) · round(b[i]·scale)` as a LONG — exact integer
  * arithmetic, order-independent, engine-stable.
  *
  * This is the (b)-tier custom-operator case from the build rules: the
  * built-in formulation `aggregate(zip_with(a, b, (x,y) -> …), 0L, +)`
  * allocates an intermediate array per row and walks higher-order-function
  * lambdas per element; this expression is a single fused loop over the two
  * `ArrayData` buffers with no allocation, inside whole-stage codegen. On
  * the brute-force ANN kernel (500k pairs × 64 dims) that is the hot path.
  *
  * Null semantics: null array → null (BinaryExpression); null element →
  * null result (same as the zip_with formulation). Lengths may differ; the
  * common prefix is used.
  */
case class QuantizedDotProduct(left: Expression, right: Expression, scale: Int)
  extends BinaryExpression {

  override def dataType: DataType = LongType

  // a NULL ELEMENT nulls the result even when both array columns are
  // non-nullable; without this override the non-nullable codegen branch
  // never declares ev.isNull, and our generated `ev.isNull = true`
  // references an undeclared variable (Janino compile failure), while the
  // interpreted path would hand a null through a non-nullable schema slot
  override def nullable: Boolean = true

  private def elemType(e: Expression): Option[DataType] = e.dataType match {
    case ArrayType(t @ (FloatType | DoubleType | LongType | IntegerType), _) => Some(t)
    case _ => None
  }

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (elemType(left).isDefined && elemType(right).isDefined)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"dot_q needs two array<float|double|long|int> columns, got " +
          s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }

  private def getElem(a: ArrayData, t: DataType, i: Int): Double = t match {
    case FloatType  => a.getFloat(i).toDouble
    case DoubleType => a.getDouble(i)
    case LongType   => a.getLong(i).toDouble
    case IntegerType => a.getInt(i).toDouble
    case _ => throw new IllegalStateException("unreachable")
  }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val (ta, tb) = (elemType(left).get, elemType(right).get)
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0L
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      acc += QMath.qround(getElem(a, ta, i) * scale) *
             QMath.qround(getElem(b, tb, i) * scale)
      i += 1
    }
    acc
  }

  private def accessor(t: DataType, arr: String, i: String): String = t match {
    case FloatType   => s"(double)$arr.getFloat($i)"
    case DoubleType  => s"$arr.getDouble($i)"
    case LongType    => s"(double)$arr.getLong($i)"
    case IntegerType => s"(double)$arr.getInt($i)"
    case _ => throw new IllegalStateException("unreachable")
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val (ta, tb) = (elemType(left).get, elemType(right).get)
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |long $acc = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |  $acc += graft.functions.QMath.qround(${accessor(ta, a, i)} * $scale)
         |        * graft.functions.QMath.qround(${accessor(tb, b, i)} * $scale);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): QuantizedDotProduct =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "dot_q"
}

