package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded top-k buffer over (id, score): two parallel primitive arrays
  * kept sorted best-first. Insert is O(k) (k is small: 3..100); merge is
  * a linear merge. No boxing, no per-row object churn.
  */
final class TopKHeap(val k: Int, val ascending: Boolean) {
  val ids = new Array[Long](k)
  val scores = new Array[Double](k)
  var n = 0

  @inline private def better(s1: Double, i1: Long, s2: Double, i2: Long): Boolean =
    if (s1 != s2) { if (ascending) s1 < s2 else s1 > s2 } else i1 < i2

  def insert(id: Long, score: Double): Unit = {
    if (n == k && !better(score, id, scores(n - 1), ids(n - 1))) return
    // find insert position (linear from the tail; inputs are mostly
    // non-improving so this loop usually doesn't run at all)
    var pos = if (n < k) n else n - 1
    while (pos > 0 && better(score, id, scores(pos - 1), ids(pos - 1))) pos -= 1
    // shift right
    var j = math.min(n, k - 1)
    while (j > pos) { ids(j) = ids(j - 1); scores(j) = scores(j - 1); j -= 1 }
    ids(pos) = id; scores(pos) = score
    if (n < k) n += 1
  }

  def mergeIn(other: TopKHeap): Unit = {
    var i = 0
    while (i < other.n) { insert(other.ids(i), other.scores(i)); i += 1 }
  }
}

/** Native Catalyst top-k-by-score aggregate — the scalable form of the
  * reference's `FEDERATED_SEARCH(..., k, vector)` per-query limit
  * (reference README.md:404-407; k=3 at README.md:406).
  *
  * A TypedImperativeAggregate with a primitive-array buffer: the update
  * path is two `eval`s and an O(k) insert — no Encoder round-trip per
  * input row (the `Aggregator`/udaf route costs ~6x more per row). With
  * map-side partial aggregation, only ≤k rows per group per partition
  * reach the shuffle, so a |Q|x|C| scored cross product never hits disk.
  */
case class TopKByScore(
    left: Expression,   // id: LongType (or any integral, read as long)
    right: Expression,  // score: DoubleType
    k: Int,
    ascending: Boolean,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKHeap] with BinaryLike[Expression] {

  override def prettyName: String = "top_k_by_score"
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("id", LongType), StructField("score", DoubleType))))

  override def createAggregationBuffer(): TopKHeap = new TopKHeap(k, ascending)

  override def update(buf: TopKHeap, input: InternalRow): TopKHeap = {
    val idv = left.eval(input)
    val sv = right.eval(input)
    if (idv != null && sv != null) {
      val id = idv match {
        case l: java.lang.Long => l.longValue()
        case i: java.lang.Integer => i.longValue()
        case s: java.lang.Short => s.longValue()
        case other => other.asInstanceOf[Number].longValue()
      }
      buf.insert(id, sv.asInstanceOf[Number].doubleValue())
    }
    buf
  }

  override def merge(buf: TopKHeap, other: TopKHeap): TopKHeap = { buf.mergeIn(other); buf }

  override def eval(buf: TopKHeap): Any = {
    val out = new Array[Any](buf.n)
    var i = 0
    while (i < buf.n) {
      out(i) = InternalRow(buf.ids(i), buf.scores(i))
      i += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(buf: TopKHeap): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buf.n * 16)
    bb.putInt(buf.n)
    var i = 0
    while (i < buf.n) { bb.putLong(buf.ids(i)); bb.putDouble(buf.scores(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKHeap = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val h = new TopKHeap(k, ascending)
    var i = 0
    while (i < n) { h.ids(i) = bb.getLong; h.scores(i) = bb.getDouble; i += 1 }
    h.n = n
    h
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKByScore =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKByScore =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(l: Expression, r: Expression): TopKByScore =
    copy(left = l, right = r)
}

object TopKByScore {
  import org.apache.spark.sql.graftshim.Shim

  /** Column API: `top_k_by_score(id, score, k)` -> ARRAY<STRUCT<id,score>>
    * sorted best-first (ties broken by lower id).
    */
  def topK(id: Column, score: Column, k: Int, ascending: Boolean = false): Column =
    Shim.column(
      TopKByScore(Shim.expression(id), Shim.expression(score), k, ascending)
        .toAggregateExpression())
}
