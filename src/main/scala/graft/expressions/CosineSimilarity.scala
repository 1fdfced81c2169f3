package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expression for cosine similarity between two numeric
  * arrays (float or double elements), computed in double precision in a
  * single fused loop with full whole-stage-codegen support.
  *
  * Replaces the `aggregate(zip_with(...))` formulation (VectorFunctions
  * .cosineSim), which allocates an intermediate array per row pair — the
  * difference is ~10x on the all-pairs similarity join. Numerics are
  * identical: ascending-index double accumulation of dot and both norms,
  * result = dot / sqrt(na * nb), the same formula and fold order as DuckDB's
  * `list_cosine_similarity`, so oracle comparisons are unaffected.
  *
  * Null handling: null input array → null result (BinaryExpression default);
  * element nulls are not expected (embedding columns are containsNull=false)
  * and read as 0. Arrays of different length use the common prefix for the
  * dot product and each full array for its own norm.
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  // null when either input is null OR either norm is zero (a NaN would sort
  // ABOVE every real similarity in a descending top-k — the zero-vector
  // embedder fallback must never rank first)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(dt: DataType): Boolean = dt match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"cosine_sim expects array<float|double> inputs, got ${left.dataType} / ${right.dataType}")
  }

  private def elemIsFloat(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val na = a.numElements()
    val nb = b.numElements()
    val n = math.min(na, nb)
    val aF = elemIsFloat(left)
    val bF = elemIsFloat(right)
    var dot = 0.0
    var sa = 0.0
    var sb = 0.0
    var i = 0
    while (i < n) {
      val x = if (aF) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bF) b.getFloat(i).toDouble else b.getDouble(i)
      dot += x * y
      sa += x * x
      sb += y * y
      i += 1
    }
    while (i < na) { val x = if (aF) a.getFloat(i).toDouble else a.getDouble(i); sa += x * x; i += 1 }
    i = n
    while (i < nb) { val y = if (bF) b.getFloat(i).toDouble else b.getDouble(i); sb += y * y; i += 1 }
    val denom = sa * sb
    if (denom == 0.0) null else java.lang.Double.valueOf(dot / math.sqrt(denom))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aGet = if (elemIsFloat(left)) "getFloat" else "getDouble"
    val bGet = if (elemIsFloat(right)) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val dot = ctx.freshName("dot")
      val sa = ctx.freshName("sa")
      val sb = ctx.freshName("sb")
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val denom = ctx.freshName("denom")
      s"""
         |int $na = $a.numElements();
         |int $nb = $b.numElements();
         |int $n = Math.min($na, $nb);
         |double $dot = 0.0, $sa = 0.0, $sb = 0.0;
         |int $i = 0;
         |for (; $i < $n; $i++) {
         |  double x = (double) $a.$aGet($i);
         |  double y = (double) $b.$bGet($i);
         |  $dot += x * y; $sa += x * x; $sb += y * y;
         |}
         |for (; $i < $na; $i++) { double x = (double) $a.$aGet($i); $sa += x * x; }
         |for ($i = $n; $i < $nb; $i++) { double y = (double) $b.$bGet($i); $sb += y * y; }
         |double $denom = $sa * $sb;
         |if ($denom == 0.0) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $dot / Math.sqrt($denom);
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "cosine_sim"
}

/** Dot product — same fused-loop construction (used by the normalized-vector
  * fast path where norms are precomputed).
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  private def elemIsFloat(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    val aF = elemIsFloat(left)
    val bF = elemIsFloat(right)
    var dot = 0.0
    var i = 0
    while (i < n) {
      val x = if (aF) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bF) b.getFloat(i).toDouble else b.getDouble(i)
      dot += x * y
      i += 1
    }
    dot
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aGet = if (elemIsFloat(left)) "getFloat" else "getDouble"
    val bGet = if (elemIsFloat(right)) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val dot = ctx.freshName("dot")
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      s"""
         |int $n = Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $dot += ((double) $a.$aGet($i)) * ((double) $b.$bGet($i));
         |}
         |${ev.value} = $dot;
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "dot_product"
}
