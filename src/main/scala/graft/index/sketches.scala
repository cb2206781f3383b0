package graft.index

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream, ObjectInputStream, ObjectOutputStream}

import org.apache.spark.sql.types.{DataType, IntegerType}
import org.apache.spark.util.sketch.BloomFilter
import org.roaringbitmap.RoaringBitmap

/** Per-(file × column) membership sketch used to sharpen equality/IN
  * pruning beyond min/max ranges. Three kinds, mirroring the reference's
  * ColumnFilterStatistics.scala:37-393:
  *   - bloom  — probabilistic, any canonical type (Spark's BloomFilter);
  *   - dict   — exact HashSet membership;
  *   - bitmap — RoaringBitmap, IntegerType columns only (auto-selected for
  *              kind "dict" on int columns, reference :165-181).
  *
  * Values are canonical (Long or String — see [[Canon]]); Date/Timestamp
  * enter as epoch longs, matching the reference's epoch hashing
  * (ColumnFilterStatistics.scala:279-299).
  */
sealed trait Sketch extends Serializable {
  def kind: String
  def put(canon: Any): Unit
  def mightContain(canon: Any): Boolean
  def merge(other: Sketch): Sketch
  def serialize(): Array[Byte]

  /** May the file contain a STRING value satisfying `pred`? Only an exact
    * dictionary can answer (it enumerates the file's value set); the
    * probabilistic/bitmap sketches return true (= cannot prune). Powers
    * Contains/EndsWith pruning — beyond the reference, which always
    * scans on those predicates (ParquetIndexFilters.scala:128-137). */
  def mightContainMatching(pred: String => Boolean): Boolean = true
}

final class BloomSketch(val bf: BloomFilter) extends Sketch {
  override def kind: String = Sketch.Bloom
  override def put(canon: Any): Unit = canon match {
    case l: Long => bf.putLong(l)
    case s: String => bf.putString(s)
    case other => throw new IllegalArgumentException(s"bad canon $other")
  }
  override def mightContain(canon: Any): Boolean = canon match {
    case l: Long => bf.mightContainLong(l)
    case s: String => bf.mightContainString(s)
    case _ => true
  }
  override def merge(other: Sketch): Sketch = {
    bf.mergeInPlace(other.asInstanceOf[BloomSketch].bf); this
  }
  override def serialize(): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    bf.writeTo(out)
    out.toByteArray
  }
}

final class DictSketch(val set: java.util.HashSet[Any]) extends Sketch {
  override def kind: String = Sketch.Dict
  override def put(canon: Any): Unit = { set.add(canon); () }
  override def mightContain(canon: Any): Boolean = set.contains(canon)
  override def merge(other: Sketch): Sketch = {
    set.addAll(other.asInstanceOf[DictSketch].set); this
  }
  /** Exact: scan the value set. A non-string entry (dict over a numeric
    * column) makes the predicate inapplicable → conservative true. */
  override def mightContainMatching(pred: String => Boolean): Boolean = {
    val it = set.iterator()
    while (it.hasNext) {
      it.next() match {
        case s: String => if (pred(s)) return true
        case _ => return true
      }
    }
    false
  }
  override def serialize(): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val oos = new ObjectOutputStream(bos)
    oos.writeObject(set)
    oos.close()
    bos.toByteArray
  }
}

final class BitmapSketch(val bm: RoaringBitmap) extends Sketch {
  override def kind: String = Sketch.Bitmap
  override def put(canon: Any): Unit = canon match {
    case l: Long if l >= Int.MinValue && l <= Int.MaxValue => bm.add(l.toInt)
    case other => throw new IllegalArgumentException(s"bitmap needs int, got $other")
  }
  override def mightContain(canon: Any): Boolean = canon match {
    case l: Long => l >= Int.MinValue && l <= Int.MaxValue && bm.contains(l.toInt)
    case _ => true
  }
  override def merge(other: Sketch): Sketch = {
    bm.or(other.asInstanceOf[BitmapSketch].bm); this
  }
  override def serialize(): Array[Byte] = {
    bm.runOptimize()
    val bos = new ByteArrayOutputStream()
    bm.serialize(new DataOutputStream(bos))
    bos.toByteArray
  }
}

object Sketch {
  val Bloom = "bloom"
  val Dict = "dict"
  val Bitmap = "bitmap"

  /** Reference bloom sizing: expected items min(rows, 2^20), FPP 3%
    * (ColumnFilterStatistics.scala:253-262). */
  val MaxExpectedItems: Long = 1L << 20
  val DefaultFpp: Double = 0.03

  /** Resolve the effective sketch kind for a column: conf kind "dict" on an
    * IntegerType column upgrades to a roaring bitmap (reference :165-181). */
  def resolveKind(confKind: String, dt: DataType): String = confKind match {
    case Dict if dt == IntegerType => Bitmap
    case k => k
  }

  def create(kind: String, expectedItems: Long): Sketch = kind match {
    case Bloom =>
      new BloomSketch(BloomFilter.create(math.max(1L, math.min(expectedItems, MaxExpectedItems)), DefaultFpp))
    case Dict => new DictSketch(new java.util.HashSet[Any]())
    case Bitmap => new BitmapSketch(new RoaringBitmap())
    case other => throw new IllegalArgumentException(s"unknown sketch kind: $other")
  }

  def deserialize(kind: String, bytes: Array[Byte]): Sketch = kind match {
    case Bloom => new BloomSketch(BloomFilter.readFrom(new ByteArrayInputStream(bytes)))
    case Dict =>
      val ois = new ObjectInputStream(new ByteArrayInputStream(bytes))
      new DictSketch(ois.readObject().asInstanceOf[java.util.HashSet[Any]])
    case Bitmap =>
      val bm = new RoaringBitmap()
      bm.deserialize(new DataInputStream(new ByteArrayInputStream(bytes)))
      new BitmapSketch(bm)
    case other => throw new IllegalArgumentException(s"unknown sketch kind: $other")
  }
}
