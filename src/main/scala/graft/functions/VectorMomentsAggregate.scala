package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream,
  DataInputStream, DataOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** Running second-moment state over fixed-dimension vectors: count,
  * per-dimension sums, and the upper triangle of the Σ xxᵀ outer-
  * product sums (i ≤ j, row-major flattened). Dimension is learned
  * from the first vector and enforced thereafter. Merging is
  * element-wise addition — the state is a mergeable summary, so
  * map-side partial aggregation applies and exactly ONE
  * O(d²)-sized buffer per task reaches the shuffle regardless of
  * row count.
  */
final class VecMoments {
  var d: Int = -1
  var n: Long = 0L
  var sum: Array[Double] = _
  var prod: Array[Double] = _ // upper triangle, length d*(d+1)/2

  private[functions] def init(dim: Int): Unit = {
    d = dim
    sum = new Array[Double](dim)
    prod = new Array[Double](dim * (dim + 1) / 2)
  }

  def add(v: ArrayData): Unit = {
    if (d < 0) init(v.numElements())
    require(v.numElements() == d,
      s"vector dimension ${v.numElements()} != $d")
    n += 1
    var i = 0
    var t = 0
    while (i < d) {
      val xi = v.getDouble(i)
      sum(i) += xi
      var j = i
      while (j < d) {
        prod(t) += xi * v.getDouble(j)
        t += 1
        j += 1
      }
      i += 1
    }
  }

  def mergeIn(o: VecMoments): Unit = {
    if (o.d < 0) return
    if (d < 0) init(o.d)
    require(o.d == d, s"vector dimension ${o.d} != $d")
    n += o.n
    var i = 0
    while (i < sum.length) { sum(i) += o.sum(i); i += 1 }
    var t = 0
    while (t < prod.length) { prod(t) += o.prod(t); t += 1 }
  }
}

/** One-pass vector moments aggregate — the distributed covariance
  * shape: each task folds its rows into one O(d²) buffer, buffers
  * merge by addition, and the driver receives a SINGLE
  * (n, Σx, Σxxᵀ-upper) row from which mean vector and covariance
  * matrix follow in O(d²) — the input is streamed exactly once and
  * nothing row-count-sized ever leaves the executors. Feeds
  * [[graft.operators.Similarity.pcaTopComponent]].
  */
case class VectorMomentsAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[VecMoments] with UnaryLike[Expression] {

  override def prettyName: String = "vector_moments"
  override def nullable: Boolean = false
  override val dataType: DataType = StructType(Seq(
    StructField("n", LongType, nullable = false),
    StructField("sums", ArrayType(DoubleType, containsNull = false),
      nullable = false),
    StructField("prods", ArrayType(DoubleType, containsNull = false),
      nullable = false)))

  override def createAggregationBuffer(): VecMoments = new VecMoments

  override def update(b: VecMoments, input: InternalRow): VecMoments = {
    val v = child.eval(input)
    if (v != null) b.add(v.asInstanceOf[ArrayData])
    b
  }

  override def merge(b: VecMoments, o: VecMoments): VecMoments = {
    b.mergeIn(o); b
  }

  override def eval(b: VecMoments): Any = {
    val sums = if (b.d < 0) Array.empty[Double] else b.sum
    val prods = if (b.d < 0) Array.empty[Double] else b.prod
    new GenericInternalRow(Array[Any](b.n,
      new GenericArrayData(sums.map(x => x: Any)),
      new GenericArrayData(prods.map(x => x: Any))))
  }

  override def serialize(b: VecMoments): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(b.d)
    out.writeLong(b.n)
    if (b.d >= 0) {
      var i = 0
      while (i < b.sum.length) { out.writeDouble(b.sum(i)); i += 1 }
      var t = 0
      while (t < b.prod.length) { out.writeDouble(b.prod(t)); t += 1 }
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): VecMoments = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val b = new VecMoments
    val d = in.readInt()
    val n = in.readLong()
    b.n = n
    if (d >= 0) {
      b.init(d)
      var i = 0
      while (i < b.sum.length) { b.sum(i) = in.readDouble(); i += 1 }
      var t = 0
      while (t < b.prod.length) { b.prod(t) = in.readDouble(); t += 1 }
    }
    b
  }

  override def withNewMutableAggBufferOffset(o: Int): VectorMomentsAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): VectorMomentsAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(newChild: Expression)
      : VectorMomentsAgg = copy(child = newChild)
}

object VectorMomentsAgg {
  /** Column-API entry: one-pass (n, Σx, Σxxᵀ-upper) over an
    * array&lt;double&gt; column.
    */
  def vectorMoments(c: Column): Column =
    ColumnBridge.column(
      VectorMomentsAgg(ColumnBridge.expression(c)).toAggregateExpression())
}
