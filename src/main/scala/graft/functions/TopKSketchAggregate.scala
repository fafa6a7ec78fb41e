package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream,
  DataInputStream, DataOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra-Gries heavy-hitter state: at most `capacity` (value, count)
  * counters. Point update is the classic algorithm (existing key +1;
  * room → insert; full → decrement ALL, drop zeros); merge is the
  * Berinde et al. (PODS '09) mergeable-summaries form — sum counters,
  * then subtract the (capacity+1)-th largest count and drop ≤ 0.
  * Guarantees after any update/merge tree: every reported count is an
  * UNDERCOUNT by at most n/capacity (n = total rows folded in), and
  * any value with true frequency > n/capacity is present. With
  * capacity ≥ the column's distinct count no decrement ever fires and
  * the counts are EXACT — the regime the DuckDB oracle replays.
  */
final class TopKSketch(val capacity: Int) {
  val counts = new java.util.HashMap[UTF8String, Long](capacity * 2)
  var n: Long = 0L

  def add(v: UTF8String): Unit = {
    n += 1
    val c = counts.get(v)
    // existing key: HashMap.put keeps the old (already-cloned) key
    // object, so no re-clone; new key: clone off the row buffer
    if (c != 0L) counts.put(v, c + 1L)
    else if (counts.size < capacity) counts.put(v.clone(), 1L)
    else {
      // decrement phase: every counter loses 1 (the arriving value's
      // implicit counter cancels against them)
      val it = counts.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        if (e.getValue == 1L) it.remove() else e.setValue(e.getValue - 1L)
      }
    }
  }

  def mergeIn(o: TopKSketch): Unit = {
    n += o.n
    val it = o.counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val c = counts.get(e.getKey)
      counts.put(e.getKey, c + e.getValue)
    }
    if (counts.size > capacity) {
      val vals = new Array[Long](counts.size)
      val vit = counts.values().iterator()
      var i = 0
      while (vit.hasNext) { vals(i) = vit.next(); i += 1 }
      java.util.Arrays.sort(vals)
      val cut = vals(counts.size - capacity - 1) // (capacity+1)-th largest
      val eit = counts.entrySet().iterator()
      while (eit.hasNext) {
        val e = eit.next()
        if (e.getValue <= cut) eit.remove()
        else e.setValue(e.getValue - cut)
      }
    }
  }
}

/** Approximate top-K frequency aggregate over a string column — the
  * 100 TB shape of the frequency table: one pass, O(capacity) memory
  * per task, and only `capacity` counters per partition reach the
  * shuffle (an exact frequency table shuffles every distinct value).
  * Output: the top `k` (value, count) structs by (count DESC, value
  * ASC). Counts are exact when `capacity` ≥ the column's distinct
  * count, else undercounts bounded by n/capacity (see [[TopKSketch]]).
  */
case class TopKSketchAgg(
    child: Expression,
    k: Int,
    capacity: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKSketch] with UnaryLike[Expression] {
  require(k > 0 && capacity >= k, "need capacity >= k > 0")

  override def prettyName: String = "approx_top_k_freq"
  override def nullable: Boolean = false
  override val dataType: DataType = ArrayType(StructType(Seq(
    StructField("value", StringType, nullable = false),
    StructField("cnt", LongType, nullable = false))), containsNull = false)

  override def createAggregationBuffer(): TopKSketch =
    new TopKSketch(capacity)

  override def update(b: TopKSketch, input: InternalRow): TopKSketch = {
    val v = child.eval(input)
    if (v != null) b.add(v.asInstanceOf[UTF8String])
    b
  }

  override def merge(b: TopKSketch, o: TopKSketch): TopKSketch = {
    b.mergeIn(o); b
  }

  override def eval(b: TopKSketch): Any = {
    val entries = new Array[(UTF8String, Long)](b.counts.size)
    val it = b.counts.entrySet().iterator()
    var i = 0
    while (it.hasNext) {
      val e = it.next()
      entries(i) = (e.getKey, e.getValue)
      i += 1
    }
    val top = entries.sortBy { case (v, c) => (-c, v) }.take(k)
    new GenericArrayData(top.map { case (v, c) =>
      new GenericInternalRow(Array[Any](v, c))
    })
  }

  override def serialize(b: TopKSketch): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeLong(b.n)
    out.writeInt(b.counts.size)
    val it = b.counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val bytes = e.getKey.getBytes
      out.writeInt(bytes.length)
      out.write(bytes)
      out.writeLong(e.getValue)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): TopKSketch = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val b = createAggregationBuffer()
    b.n = in.readLong()
    val size = in.readInt()
    var i = 0
    while (i < size) {
      val len = in.readInt()
      val arr = new Array[Byte](len)
      in.readFully(arr)
      b.counts.put(UTF8String.fromBytes(arr), in.readLong())
      i += 1
    }
    b
  }

  override def withNewMutableAggBufferOffset(o: Int): TopKSketchAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TopKSketchAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(newChild: Expression)
      : TopKSketchAgg = copy(child = newChild)
}

object TopKSketchAgg {
  /** Column-API entry: Misra-Gries top-k of a string column. */
  def approxTopK(c: Column, k: Int, capacity: Int): Column =
    ColumnBridge.column(TopKSketchAgg(ColumnBridge.expression(c), k,
      capacity).toAggregateExpression())
}
