package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native Catalyst expressions for the index families' per-row model
  * kernels — centroid assignment (IVF), PQ/SQ/BQ encode/decode, residual
  * and ADC reconstruction. These replace the `udf((v: Seq[Float]) => ...)`
  * closures that previously sat in every store build, append, and probe
  * path: a Scala UDF deserializes each `array<float>` into a boxed
  * `Seq[Float]` per row and breaks whole-stage codegen around itself,
  * which at 100 TB is a per-row tax on the hottest scans the engine
  * runs (the optimization guide's "prefer built-in/codegen expressions"
  * rule and VERDICT r17 task 5).
  *
  * Shape: each expression ships `doGenCode` that calls a static kernel
  * in [[ModelKernels]] with the trained model attached via
  * `ctx.addReferenceObj` — the kernel reads `ArrayData` primitives
  * directly (zero boxing, zero Seq materialization) and the expression
  * stays inside the surrounding WholeStageCodegen span. The float
  * arithmetic replicates the replaced closures BIT-FOR-BIT (same
  * accumulation order, same `VectorSearch.scoreF32` semantics), so
  * every store build and probe is row-identical to the UDF path —
  * asserted by the existing family specs, which gate on exact results.
  */
object ModelKernels {

  /** Index of the nearest centroid (L2), ties to the lower id — the
    * [[graft.operators.IvfSearch.nearestCell]] rule verbatim.
    */
  def nearestCell(cs: Array[Array[Float]], v: ArrayData): Int = {
    var best = 0; var bestD = Double.MaxValue
    var i = 0
    while (i < cs.length) {
      val c = cs(i)
      val n = math.min(v.numElements(), c.length)
      var acc = 0.0f
      var j = 0
      while (j < n) { val d = v.getFloat(j) - c(j); acc += d * d; j += 1 }
      val dist = math.sqrt(acc.toDouble)
      if (dist < bestD) { bestD = dist; best = i }
      i += 1
    }
    best
  }

  /** Indices of the `nProbe` nearest centroids, best first, ties to the
    * lower id — [[graft.operators.IvfSearch.nearestCells]] verbatim
    * (full sort by (distance, id), take nProbe).
    */
  def nearestCells(cs: Array[Array[Float]], nProbe: Int, v: ArrayData): ArrayData = {
    val ds = new Array[Double](cs.length)
    var i = 0
    while (i < cs.length) {
      val c = cs(i)
      val n = math.min(v.numElements(), c.length)
      var acc = 0.0f
      var j = 0
      while (j < n) { val d = v.getFloat(j) - c(j); acc += d * d; j += 1 }
      ds(i) = math.sqrt(acc.toDouble)
      i += 1
    }
    val take = math.min(nProbe, cs.length)
    val out = new Array[Int](take)
    val used = new Array[Boolean](cs.length)
    var r = 0
    while (r < take) {
      var best = -1; var bestD = Double.MaxValue
      var c = 0
      while (c < cs.length) {
        if (!used(c) && (best < 0 || ds(c) < bestD)) { bestD = ds(c); best = c }
        c += 1
      }
      used(best) = true
      out(r) = best
      r += 1
    }
    new GenericArrayData(out)
  }

  /** L2 distance of a vector to its assigned centroid —
    * [[graft.operators.IvfSearch.cellDist]] verbatim.
    */
  def cellDist(cs: Array[Array[Float]], v: ArrayData, cell: Int): Double = {
    val c = cs(cell)
    val n = math.min(v.numElements(), c.length)
    var acc = 0.0f
    var j = 0
    while (j < n) { val d = v.getFloat(j) - c(j); acc += d * d; j += 1 }
    math.sqrt(acc.toDouble)
  }

  /** PQ encode: nearest sub-centroid per subspace (L2, ties to the lower
    * code) — [[graft.operators.PqSearch.encodeUdf]] verbatim, including
    * the fail-fast on a dimension mismatch.
    */
  def pqEncode(m: Int, kCodes: Int, dsub: Int,
      books: Array[Array[Array[Float]]], v: ArrayData): ArrayData = {
    require(v.numElements() == m * dsub,
      s"encode: vector has ${v.numElements()} dims, codebooks expect ${m * dsub}")
    val out = new Array[Int](m)
    var s = 0
    while (s < m) {
      val base = s * dsub
      var best = 0; var bestD = Double.MaxValue
      var c = 0
      while (c < kCodes) {
        val b = books(s)(c)
        val n = math.min(dsub, b.length)
        var acc = 0.0f
        var j = 0
        while (j < n) { val d = v.getFloat(base + j) - b(j); acc += d * d; j += 1 }
        val dist = math.sqrt(acc.toDouble)
        if (dist < bestD) { bestD = dist; best = c }
        c += 1
      }
      out(s) = best
      s += 1
    }
    new GenericArrayData(out)
  }

  /** vector − its cell centroid — [[graft.operators.IvfPqIndex]]'s
    * residual computation verbatim (a vector longer than the centroid
    * fails on the same out-of-bounds the closure did).
    */
  def residual(cs: Array[Array[Float]], v: ArrayData, cell: Int): ArrayData = {
    val c = cs(cell)
    val n = v.numElements()
    val out = new Array[Float](n)
    var i = 0
    while (i < n) { out(i) = v.getFloat(i) - c(i); i += 1 }
    new GenericArrayData(out)
  }

  /** centroid + residual sub-centroids — the IVF-PQ reconstruction
    * (decode view) of a code row, verbatim from the radius serve.
    */
  def pqReconstruct(cs: Array[Array[Float]], m: Int, dsub: Int,
      books: Array[Array[Array[Float]]], codes: ArrayData, cell: Int): ArrayData = {
    val base = cs(cell)
    val out = java.util.Arrays.copyOf(base, base.length)
    var s = 0
    while (s < m) {
      val book = books(s)(codes.getInt(s))
      var j = 0
      while (j < dsub) { out(s * dsub + j) += book(j); j += 1 }
      s += 1
    }
    new GenericArrayData(out)
  }

  /** SQ8 encode — [[graft.operators.SqSearch.encodeVec]] verbatim
    * (saturating clamp, degenerate dims encode 0).
    */
  def sqEncode(lo: Array[Float], hi: Array[Float], v: ArrayData): Array[Byte] = {
    val dim = lo.length
    require(v.numElements() == dim,
      s"encode: vector has ${v.numElements()} dims, model expects $dim")
    val out = new Array[Byte](dim)
    var d = 0
    while (d < dim) {
      val delta = hi(d) - lo(d)
      val c =
        if (delta <= 0f) 0
        else math.max(0, math.min(255,
          math.round((v.getFloat(d) - lo(d)) / delta * 255f)))
      out(d) = c.toByte
      d += 1
    }
    out
  }

  /** SQ8 decode — [[graft.operators.SqSearch.decodeVec]] verbatim. */
  def sqDecode(lo: Array[Float], hi: Array[Float], codes: Array[Byte]): ArrayData = {
    val dim = lo.length
    require(codes.length == dim,
      s"decode: code row has ${codes.length} bytes, model expects $dim")
    val out = new Array[Float](dim)
    var d = 0
    while (d < dim) {
      val delta = hi(d) - lo(d)
      out(d) = lo(d) + (if (delta <= 0f) 0f else delta * (codes(d) & 0xff) / 255f)
      d += 1
    }
    new GenericArrayData(out)
  }

  /** BQ sign-encode into one 64-bit word (dim ≤ 64) —
    * [[graft.operators.BqSearch.encodeVec]] word 0.
    */
  def bqEncodeWord(thr: Array[Float], v: ArrayData): Long = {
    require(v.numElements() == thr.length,
      s"encode: vector has ${v.numElements()} dims, model expects ${thr.length}")
    var out = 0L
    var d = 0
    while (d < thr.length) {
      if (v.getFloat(d) > thr(d)) out |= 1L << (d % 64)
      d += 1
    }
    out
  }

  /** BQ sign-encode into packed words (dim > 64). */
  def bqEncodeWords(thr: Array[Float], words: Int, v: ArrayData): ArrayData = {
    require(v.numElements() == thr.length,
      s"encode: vector has ${v.numElements()} dims, model expects ${thr.length}")
    val out = new Array[Long](words)
    var d = 0
    while (d < thr.length) {
      if (v.getFloat(d) > thr(d)) out(d / 64) |= 1L << (d % 64)
      d += 1
    }
    new GenericArrayData(out)
  }
}

/** Centroid assignment: `array<float>` → nearest cell id (int). */
case class NearestCentroidExpr(child: Expression, centroids: Array[Array[Float]])
    extends UnaryExpression {
  override def prettyName: String = "nearest_centroid"
  override def dataType: DataType = IntegerType

  override def nullSafeEval(v: Any): Any =
    ModelKernels.nearestCell(centroids, v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cs = ctx.addReferenceObj("centroids", centroids, "float[][]")
    defineCodeGen(ctx, ev, v =>
      s"graft.functions.ModelKernels.nearestCell($cs, $v)")
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** Probe set: `array<float>` → nProbe nearest cell ids, best first. */
case class NearestCentroidsExpr(child: Expression,
    centroids: Array[Array[Float]], nProbe: Int) extends UnaryExpression {
  override def prettyName: String = "nearest_centroids"
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def nullSafeEval(v: Any): Any =
    ModelKernels.nearestCells(centroids, nProbe, v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cs = ctx.addReferenceObj("centroids", centroids, "float[][]")
    defineCodeGen(ctx, ev, v =>
      s"graft.functions.ModelKernels.nearestCells($cs, $nProbe, $v)")
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** Assigned-centroid distance: (`array<float>`, cell int) → double. */
case class CellDistExpr(left: Expression, right: Expression,
    centroids: Array[Array[Float]]) extends BinaryExpression {
  override def prettyName: String = "cell_dist"
  override def dataType: DataType = DoubleType

  override def nullSafeEval(v: Any, cell: Any): Any =
    ModelKernels.cellDist(centroids, v.asInstanceOf[ArrayData],
      cell.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cs = ctx.addReferenceObj("centroids", centroids, "float[][]")
    defineCodeGen(ctx, ev, (v, cell) =>
      s"graft.functions.ModelKernels.cellDist($cs, $v, $cell)")
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** PQ encode: `array<float>` → `array<int>` of m codes. */
case class PqEncodeExpr(child: Expression, m: Int, kCodes: Int, dsub: Int,
    books: Array[Array[Array[Float]]]) extends UnaryExpression {
  override def prettyName: String = "pq_encode"
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def nullSafeEval(v: Any): Any =
    ModelKernels.pqEncode(m, kCodes, dsub, books, v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val b = ctx.addReferenceObj("books", books, "float[][][]")
    defineCodeGen(ctx, ev, v =>
      s"graft.functions.ModelKernels.pqEncode($m, $kCodes, $dsub, $b, $v)")
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** IVF-PQ residual: (`array<float>`, cell int) → `array<float>`. */
case class ResidualExpr(left: Expression, right: Expression,
    centroids: Array[Array[Float]]) extends BinaryExpression {
  override def prettyName: String = "ivf_residual"
  override def dataType: DataType = ArrayType(FloatType, containsNull = false)

  override def nullSafeEval(v: Any, cell: Any): Any =
    ModelKernels.residual(centroids, v.asInstanceOf[ArrayData],
      cell.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cs = ctx.addReferenceObj("centroids", centroids, "float[][]")
    defineCodeGen(ctx, ev, (v, cell) =>
      s"graft.functions.ModelKernels.residual($cs, $v, $cell)")
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** IVF-PQ reconstruct: (`array<int>` codes, cell int) → `array<float>`. */
case class PqReconstructExpr(left: Expression, right: Expression,
    centroids: Array[Array[Float]], m: Int, dsub: Int,
    books: Array[Array[Array[Float]]]) extends BinaryExpression {
  override def prettyName: String = "pq_reconstruct"
  override def dataType: DataType = ArrayType(FloatType, containsNull = false)

  override def nullSafeEval(codes: Any, cell: Any): Any =
    ModelKernels.pqReconstruct(centroids, m, dsub, books,
      codes.asInstanceOf[ArrayData], cell.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cs = ctx.addReferenceObj("centroids", centroids, "float[][]")
    val b = ctx.addReferenceObj("books", books, "float[][][]")
    defineCodeGen(ctx, ev, (codes, cell) =>
      s"graft.functions.ModelKernels.pqReconstruct($cs, $m, $dsub, $b, $codes, $cell)")
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** SQ8 encode: `array<float>` → `binary` of dim bytes. */
case class SqEncodeExpr(child: Expression, lo: Array[Float], hi: Array[Float])
    extends UnaryExpression {
  override def prettyName: String = "sq_encode"
  override def dataType: DataType = BinaryType

  override def nullSafeEval(v: Any): Any =
    ModelKernels.sqEncode(lo, hi, v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val l = ctx.addReferenceObj("lo", lo, "float[]")
    val h = ctx.addReferenceObj("hi", hi, "float[]")
    defineCodeGen(ctx, ev, v =>
      s"graft.functions.ModelKernels.sqEncode($l, $h, $v)")
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** SQ8 decode: `binary` → `array<float>`. */
case class SqDecodeExpr(child: Expression, lo: Array[Float], hi: Array[Float])
    extends UnaryExpression {
  override def prettyName: String = "sq_decode"
  override def dataType: DataType = ArrayType(FloatType, containsNull = false)

  override def nullSafeEval(codes: Any): Any =
    ModelKernels.sqDecode(lo, hi, codes.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val l = ctx.addReferenceObj("lo", lo, "float[]")
    val h = ctx.addReferenceObj("hi", hi, "float[]")
    defineCodeGen(ctx, ev, codes =>
      s"graft.functions.ModelKernels.sqDecode($l, $h, $codes)")
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** BQ encode, dim ≤ 64: `array<float>` → `bigint`. */
case class BqEncodeWordExpr(child: Expression, thr: Array[Float])
    extends UnaryExpression {
  override def prettyName: String = "bq_encode"
  override def dataType: DataType = LongType

  override def nullSafeEval(v: Any): Any =
    ModelKernels.bqEncodeWord(thr, v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val t = ctx.addReferenceObj("thr", thr, "float[]")
    defineCodeGen(ctx, ev, v =>
      s"graft.functions.ModelKernels.bqEncodeWord($t, $v)")
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** BQ encode, dim > 64: `array<float>` → `array<bigint>`. */
case class BqEncodeWordsExpr(child: Expression, thr: Array[Float], words: Int)
    extends UnaryExpression {
  override def prettyName: String = "bq_encode_words"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(v: Any): Any =
    ModelKernels.bqEncodeWords(thr, words, v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val t = ctx.addReferenceObj("thr", thr, "float[]")
    defineCodeGen(ctx, ev, v =>
      s"graft.functions.ModelKernels.bqEncodeWords($t, $words, $v)")
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** Column-API surface for the model expressions. Inputs are cast to the
  * kernel's expected storage type at construction (a no-op cast is
  * optimized away), because the expressions read raw `ArrayData`
  * primitives and MUST see `array<float>` — the implicit cast a typed
  * Scala UDF used to insert.
  */
object ModelFunctions {
  import org.apache.spark.sql.graftshim.Shim.{column => toCol, expression => toExpr}

  private def f32(c: Column): Expression = toExpr(c.cast("array<float>"))

  def nearestCentroid(v: Column, centroids: Array[Array[Float]]): Column =
    toCol(NearestCentroidExpr(f32(v), centroids))
  def nearestCentroids(v: Column, centroids: Array[Array[Float]], nProbe: Int): Column =
    toCol(NearestCentroidsExpr(f32(v), centroids, nProbe))
  def cellDist(v: Column, cell: Column, centroids: Array[Array[Float]]): Column =
    toCol(CellDistExpr(f32(v), toExpr(cell.cast("int")), centroids))
  def pqEncode(v: Column, m: Int, kCodes: Int, dsub: Int,
      books: Array[Array[Array[Float]]]): Column =
    toCol(PqEncodeExpr(f32(v), m, kCodes, dsub, books))
  def residual(v: Column, cell: Column, centroids: Array[Array[Float]]): Column =
    toCol(ResidualExpr(f32(v), toExpr(cell.cast("int")), centroids))
  def pqReconstruct(codes: Column, cell: Column, centroids: Array[Array[Float]],
      m: Int, dsub: Int, books: Array[Array[Array[Float]]]): Column =
    toCol(PqReconstructExpr(toExpr(codes.cast("array<int>")),
      toExpr(cell.cast("int")), centroids, m, dsub, books))
  def sqEncode(v: Column, lo: Array[Float], hi: Array[Float]): Column =
    toCol(SqEncodeExpr(f32(v), lo, hi))
  def sqDecode(codes: Column, lo: Array[Float], hi: Array[Float]): Column =
    toCol(SqDecodeExpr(toExpr(codes.cast("binary")), lo, hi))
  def bqEncodeWord(v: Column, thr: Array[Float]): Column =
    toCol(BqEncodeWordExpr(f32(v), thr))
  def bqEncodeWords(v: Column, thr: Array[Float], words: Int): Column =
    toCol(BqEncodeWordsExpr(f32(v), thr, words))
}
