package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Native Catalyst expressions for vector similarity over
  * `ARRAY<FLOAT>` columns (the reference's embedding type — SURVEY §1.4,
  * reference README.md:270,380).
  *
  * Accumulation is float32, strictly left-to-right, widened to double at
  * the end. Two reasons:
  *  - determinism: same bits on every executor, every partitioning;
  *  - oracle parity: DuckDB's `list_dot_product`/`list_cosine_similarity`
  *    on `FLOAT[]` accumulate the same way (verified empirically), so
  *    scores hash-match without rounding tricks.
  *
  * All three ship `doGenCode`, so they stay inside whole-stage codegen —
  * this is the innermost loop of the brute-force vector search
  * (|queries| x |corpus| x dim multiply-adds) and must not fall back to
  * interpreted eval or a Scala UDF.
  */
abstract class VectorBinaryExpression extends BinaryExpression {
  // Inputs must be ARRAY<FLOAT>; enforced by the typed Column API in
  // [[VectorFunctions]] rather than ExpectsInputTypes (private[sql] in
  // Spark 4).
  override def dataType: DataType = DoubleType
}

/** dot(a, b) — the reference's similarity function (README.md:380). */
case class DotProductF32(left: Expression, right: Expression)
    extends VectorBinaryExpression {
  override def prettyName: String = "dot_product"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0f
    var i = 0
    while (i < n) { acc += x.getFloat(i) * y.getFloat(i); i += 1 }
    acc.toDouble
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |float $acc = 0.0f;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += $a.getFloat($i) * $b.getFloat($i);
         |}
         |${ev.value} = (double) $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** cosine(a, b) = clamp(dot/(|a|*|b|), -1, 1), float32 arithmetic matching
  * DuckDB's `list_cosine_similarity` bit-for-bit (DuckDB clamps the result
  * into [-1, 1]; verified empirically against DuckDB 1.0.0 — without the
  * clamp, self-similarity rounds to 1.0000001f).
  */
case class CosineSimilarityF32(left: Expression, right: Expression)
    extends VectorBinaryExpression {
  override def prettyName: String = "cosine_similarity"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0f; var aa = 0.0f; var bb = 0.0f
    var i = 0
    while (i < n) {
      val xv = x.getFloat(i); val yv = y.getFloat(i)
      dot += xv * yv; aa += xv * xv; bb += yv * yv
      i += 1
    }
    val denom = math.sqrt(aa).toFloat * math.sqrt(bb).toFloat
    val cos = dot / denom
    val clamped = if (cos > 1.0f) 1.0f else if (cos < -1.0f) -1.0f else cos
    clamped.toDouble
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val n = ctx.freshName("n")
      val dot = ctx.freshName("dot"); val aa = ctx.freshName("aa")
      val bb = ctx.freshName("bb"); val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv"); val cos = ctx.freshName("cos")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |float $dot = 0.0f; float $aa = 0.0f; float $bb = 0.0f;
         |for (int $i = 0; $i < $n; $i++) {
         |  float $xv = $a.getFloat($i); float $yv = $b.getFloat($i);
         |  $dot += $xv * $yv; $aa += $xv * $xv; $bb += $yv * $yv;
         |}
         |float $cos = $dot /
         |  ((float) java.lang.Math.sqrt($aa) * (float) java.lang.Math.sqrt($bb));
         |if ($cos > 1.0f) $cos = 1.0f; else if ($cos < -1.0f) $cos = -1.0f;
         |${ev.value} = (double) $cos;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Euclidean distance, float32 accumulation (DuckDB `list_distance`). */
case class L2DistanceF32(left: Expression, right: Expression)
    extends VectorBinaryExpression {
  override def prettyName: String = "l2_distance"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0f
    var i = 0
    while (i < n) {
      val d = x.getFloat(i) - y.getFloat(i)
      acc += d * d
      i += 1
    }
    math.sqrt(acc.toDouble)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val n = ctx.freshName("n")
      val acc = ctx.freshName("acc"); val d = ctx.freshName("d")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |float $acc = 0.0f;
         |for (int $i = 0; $i < $n; $i++) {
         |  float $d = $a.getFloat($i) - $b.getFloat($i);
         |  $acc += $d * $d;
         |}
         |${ev.value} = java.lang.Math.sqrt((double) $acc);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Column-API + SQL-registry surface for the vector expressions. */
object VectorFunctions {
  import org.apache.spark.sql.graftshim.Shim.{column => toCol, expression => toExpr}

  def dot_product(a: Column, b: Column): Column =
    toCol(DotProductF32(toExpr(a), toExpr(b)))
  def cosine_similarity(a: Column, b: Column): Column =
    toCol(CosineSimilarityF32(toExpr(a), toExpr(b)))
  def l2_distance(a: Column, b: Column): Column =
    toCol(L2DistanceF32(toExpr(a), toExpr(b)))

  /** Register `dot_product`/`cosine_similarity`/`l2_distance` for SQL. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction(
      "dot_product", es => DotProductF32(es.head, es(1)), "builtin")
    reg.createOrReplaceTempFunction(
      "cosine_similarity", es => CosineSimilarityF32(es.head, es(1)), "builtin")
    reg.createOrReplaceTempFunction(
      "l2_distance", es => L2DistanceF32(es.head, es(1)), "builtin")
  }
}
