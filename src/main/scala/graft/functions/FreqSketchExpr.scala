package graft.functions

import org.apache.datasketches.frequencies.{ErrorType, LongsSketch}
import org.apache.datasketches.memory.Memory
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Frequent-items (heavy-hitter) aggregate over long keys — the
  * Misra-Gries / SpaceSaving family via Apache DataSketches'
  * `LongsSketch` (Anderson et al., "A high-performance algorithm for
  * identifying frequent items in data streams", IMC 2017; shipped in
  * Spark's own jars).
  *
  * Why it exists: an exact `groupBy(key).count` over a key space that
  * is itself corpus-sized (distinct LINES of a 100 TB crawl, 13-gram
  * shingles) shuffles every distinct key even though only the Zipf
  * head matters. This aggregate holds a FIXED `maxMapSize`-entry map
  * per partition, partials merge associatively (map-side combine →
  * one merged sketch), and only the head survives — memory and
  * shuffle bytes are O(maxMapSize), independent of the key space.
  *
  * Guarantee (the one candidate generation needs): with
  * `ErrorType.NO_FALSE_NEGATIVES`, every item whose TRUE count ≥ the
  * requested threshold is returned — the result is a SUPERSET of the
  * true heavy hitters, each with `est ∈ [true, true + maxError]` and
  * `maxError ≤ streamLength / maxMapSize` (order-dependent estimates,
  * order-independent guarantee). Callers verify candidates exactly
  * ([[graft.operators.Dedup.boilerplateLinesSketch]]), which makes the
  * composed result EXACT with bounded memory.
  *
  * Output: `ARRAY<STRUCT<item LONG, est LONG, lb LONG, ub LONG>>` of
  * items with upper bound ≥ `threshold`, best-first; plus a trailing
  * sentinel row `(est = maxError, lb = n, ub = maxMapSize)` carrying
  * the run's error accounting so callers can assert the guarantee was
  * non-vacuous (`maxError < threshold`). The sentinel is ALWAYS the
  * LAST element — a positional contract: its item field is a marker
  * value only, and a real item's hash may legitimately collide with
  * any marker, so callers must split on position (`arr.init` /
  * `arr.last`), never on the item value.
  */
case class FreqItemsSketch(
    child: Expression,
    threshold: Long,
    maxMapSize: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[LongsSketch] with UnaryLike[Expression] {

  override def prettyName: String = "freq_items_sketch"
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("item", LongType), StructField("est", LongType),
    StructField("lb", LongType), StructField("ub", LongType))))

  override def createAggregationBuffer(): LongsSketch = new LongsSketch(maxMapSize)

  override def update(buf: LongsSketch, input: InternalRow): LongsSketch = {
    val v = child.eval(input)
    if (v != null) buf.update(v.asInstanceOf[Number].longValue())
    buf
  }

  override def merge(buf: LongsSketch, other: LongsSketch): LongsSketch =
    buf.merge(other)

  override def eval(buf: LongsSketch): Any = {
    val rows = buf.getFrequentItems(threshold, ErrorType.NO_FALSE_NEGATIVES)
    val out = new Array[Any](rows.length + 1)
    var i = 0
    while (i < rows.length) {
      out(i) = InternalRow(rows(i).getItem, rows(i).getEstimate,
        rows(i).getLowerBound, rows(i).getUpperBound)
      i += 1
    }
    out(rows.length) = InternalRow(Long.MinValue, buf.getMaximumError,
      buf.getStreamLength, maxMapSize.toLong)
    new GenericArrayData(out)
  }

  override def serialize(buf: LongsSketch): Array[Byte] = buf.toByteArray

  override def deserialize(bytes: Array[Byte]): LongsSketch =
    LongsSketch.getInstance(Memory.wrap(bytes))

  override def withNewMutableAggBufferOffset(newOffset: Int): FreqItemsSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): FreqItemsSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(c: Expression): FreqItemsSketch =
    copy(child = c)
}

object FreqItemsSketch {
  import org.apache.spark.sql.graftshim.Shim

  /** Column API: heavy-hitter candidates (one array per group) with the
    * trailing error-accounting sentinel — see the class doc.
    */
  def freqItems(item: Column, threshold: Long, maxMapSize: Int): Column =
    Shim.column(
      FreqItemsSketch(Shim.expression(item), threshold, maxMapSize)
        .toAggregateExpression())
}
