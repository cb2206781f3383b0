package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded min-heap over (key, id) long pairs, keeping the k STRONGEST
  * under the total order (key desc, id asc) — the heap root is always the
  * weakest kept pair, so an insert against a full heap is one compare in
  * the common reject case. Mutable, array-backed, zero boxing.
  */
final class TopKHeap(val k: Int) extends Serializable {
  private[functions] val keys = new Array[Long](k)
  private[functions] val ids = new Array[Long](k)
  private[functions] var n = 0

  /** (ka, ia) strictly weaker than (kb, ib) under (key desc, id asc). */
  @inline private def weaker(ka: Long, ia: Long, kb: Long, ib: Long): Boolean =
    ka < kb || (ka == kb && ia > ib)

  def insert(key: Long, id: Long): Unit = {
    if (n < k) {
      keys(n) = key; ids(n) = id; n += 1
      var i = n - 1
      while (i > 0) {
        val p = (i - 1) >> 1
        if (weaker(keys(i), ids(i), keys(p), ids(p))) { swap(i, p); i = p }
        else i = 0
      }
    } else if (weaker(keys(0), ids(0), key, id)) {
      keys(0) = key; ids(0) = id
      var i = 0
      var done = false
      while (!done) {
        val l = 2 * i + 1
        val r = l + 1
        var m = i
        if (l < n && weaker(keys(l), ids(l), keys(m), ids(m))) m = l
        if (r < n && weaker(keys(r), ids(r), keys(m), ids(m))) m = r
        if (m == i) done = true
        else { swap(i, m); i = m }
      }
    }
  }

  @inline private def swap(a: Int, b: Int): Unit = {
    val tk = keys(a); keys(a) = keys(b); keys(b) = tk
    val ti = ids(a); ids(a) = ids(b); ids(b) = ti
  }

  def size: Int = n

  def foreachPair(f: (Long, Long) => Unit): Unit = {
    var i = 0
    while (i < n) { f(keys(i), ids(i)); i += 1 }
  }

  /** Kept pairs, STRONGEST first: (key desc, id asc). Overflow-safe
    * comparator (no negation — Long.MinValue keys are legal). */
  def sortedPairs: Array[(Long, Long)] = {
    val out = new Array[(Long, Long)](n)
    var i = 0
    while (i < n) { out(i) = (keys(i), ids(i)); i += 1 }
    out.sortWith((a, b) => a._1 > b._1 || (a._1 == b._1 && a._2 < b._2))
  }
}

/** Per-group top-k WITHOUT sorting the group — the aggregate form of
  * `row_number() OVER (PARTITION BY g ORDER BY key DESC, id) <= k`,
  * with radically different scale behavior: the window form shuffles
  * and SORTS every row of every group; this TypedImperativeAggregate
  * keeps an O(k) bounded heap per group, folds map-side (partial
  * aggregation — each input partition contributes at most k pairs per
  * group to the shuffle), and merges heaps pairwise. At 100 TB the
  * shuffle carries ≤ partitions × groups × k pairs instead of every
  * row; no straggler sort on a hot group.
  *
  * Total order (key desc, id asc) — the id tiebreak makes the result
  * deterministic for any input order, which partial merging requires.
  * Null key or id pairs are skipped (an unrankable row cannot be in a
  * top-k); a group with no valid pairs evaluates to an empty array.
  *
  * Returns `array<struct<key:bigint, id:bigint>>`, strongest first.
  */
case class TopKByKey(
    key: Expression, id: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKHeap] {

  require(k >= 1, s"k must be >= 1: $k")
  require(k <= (1 << 20), s"k above 2^20 would make the per-group state " +
    s"driver-of-memory rather than bounded — use a sort for that: $k")

  override def children: Seq[Expression] = Seq(key, id)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("key", LongType, nullable = false),
    StructField("id", LongType, nullable = false))), containsNull = false)

  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (key.dataType == LongType && id.dataType == LongType) {
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    } else {
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"top_k_by requires (bigint, bigint) inputs — cast upstream; " +
          s"got (${key.dataType.simpleString}, ${id.dataType.simpleString})")
    }

  override def createAggregationBuffer(): TopKHeap = new TopKHeap(k)

  override def update(buffer: TopKHeap, input: InternalRow): TopKHeap = {
    val kv = key.eval(input)
    if (kv != null) {
      val iv = id.eval(input)
      if (iv != null) buffer.insert(kv.asInstanceOf[Long], iv.asInstanceOf[Long])
    }
    buffer
  }

  override def merge(buffer: TopKHeap, other: TopKHeap): TopKHeap = {
    other.foreachPair(buffer.insert)
    buffer
  }

  override def eval(buffer: TopKHeap): Any =
    new GenericArrayData(buffer.sortedPairs.map { case (kk, ii) =>
      InternalRow(kk, ii)
    }.asInstanceOf[Array[Any]])

  override def serialize(buffer: TopKHeap): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 16 * buffer.n)
    bb.putInt(buffer.n)
    buffer.foreachPair { (kk, ii) => bb.putLong(kk); bb.putLong(ii) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKHeap = {
    val bb = ByteBuffer.wrap(bytes)
    val m = bb.getInt
    val h = new TopKHeap(k)
    var i = 0
    while (i < m) { h.insert(bb.getLong, bb.getLong); i += 1 }
    h
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKByKey =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKByKey =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKByKey =
    copy(key = newChildren(0), id = newChildren(1))
  override def prettyName: String = "top_k_by"
}
