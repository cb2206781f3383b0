package graft.index

import org.apache.spark.sql.catalyst.util.DateTimeUtils
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Canonical value domain for index statistics and sketches.
  *
  * Every indexable Spark type maps onto either `Long` (int, long, date as
  * epoch days, timestamp as epoch micros) or `String`. Both the statistics
  * builder (Catalyst-side values) and the filter prober (external JVM values
  * from `sources.Filter`) normalize into this domain, so build and probe can
  * never disagree on representation.
  *
  * Reference semantics being reproduced: the five supported types of
  * ParquetSchemaUtils.scala:32-33 and the epoch-long hashing of
  * Date/Timestamp in ColumnFilterStatistics.scala:279-299.
  */
object Canon {

  val supportedTypes: Set[DataType] =
    Set(IntegerType, LongType, StringType, DateType, TimestampType, TimestampNTZType,
      DoubleType, FloatType)

  /** Decimal joins the Long domain as its unscaled value, so only
    * precisions whose unscaled value fits a Long are indexable (the same
    * bound as Catalyst's own long-backed Decimal). */
  def isSupported(dt: DataType): Boolean = dt match {
    case d: DecimalType => d.precision <= Decimal.MAX_LONG_DIGITS
    case other => supportedTypes.contains(other)
  }

  /** IEEE754 sortable-bits encoding: a Long whose SIGNED order equals the
    * double order under Spark SQL's comparison semantics — NaN greatest
    * (all NaN bit patterns canonicalized by doubleToLongBits) and
    * -0.0 == 0.0 (normalized before encoding). Negative doubles flip all
    * non-sign bits so larger magnitude sorts lower; positives map to
    * their raw (non-negative) bits. */
  def sortableDouble(d: Double): Long = {
    val norm = if (d == 0.0d) 0.0d else d // -0.0 -> 0.0 (SQL-equal)
    val bits = java.lang.Double.doubleToLongBits(norm)
    if (bits >= 0L) bits else bits ^ 0x7FFFFFFFFFFFFFFFL
  }

  def sortableToDouble(l: Long): Double =
    java.lang.Double.longBitsToDouble(if (l >= 0L) l else l ^ 0x7FFFFFFFFFFFFFFFL)

  def sortableFloat(f: Float): Long = {
    val norm = if (f == 0.0f) 0.0f else f
    val bits = java.lang.Float.floatToIntBits(norm)
    (if (bits >= 0) bits else bits ^ 0x7FFFFFFF).toLong
  }

  def sortableToFloat(l: Long): Float = {
    val i = l.toInt
    java.lang.Float.intBitsToFloat(if (i >= 0) i else i ^ 0x7FFFFFFF)
  }

  /** BigDecimal → unscaled Long at the COLUMN's scale. None when the
    * value doesn't rescale losslessly or overflows a Long — the fold
    * treats that as "cannot normalize" (conservative no-prune). */
  def decimalCanon(dt: DecimalType, bd: java.math.BigDecimal): Option[Long] =
    try {
      val scaled = bd.setScale(dt.scale) // throws unless lossless
      val unscaled = scaled.unscaledValue
      if (unscaled.bitLength >= 64) None else Some(unscaled.longValueExact)
    } catch { case _: ArithmeticException => None }

  /** Catalyst-internal value (Int days, Long micros, UTF8String, …) →
    * canonical. Caller guarantees v != null and dt is supported. */
  def fromCatalyst(dt: DataType, v: Any): Any = dt match {
    case IntegerType => v.asInstanceOf[Int].toLong
    case LongType => v.asInstanceOf[Long]
    case DateType => v.asInstanceOf[Int].toLong
    case TimestampType | TimestampNTZType => v.asInstanceOf[Long]
    case DoubleType => sortableDouble(v.asInstanceOf[Double])
    case FloatType => sortableFloat(v.asInstanceOf[Float])
    case d: DecimalType if d.precision <= Decimal.MAX_LONG_DIGITS =>
      // Catalyst guarantees stored values conform to the column's scale
      v.asInstanceOf[Decimal].toUnscaledLong
    case StringType => v.toString
    case other => throw new IllegalArgumentException(s"unsupported type $other")
  }

  /** External JVM value (as carried by `sources.Filter`) → canonical.
    * Returns None on any type we cannot confidently normalize — the fold
    * treats that as "may contain" (conservative). */
  def fromExternal(dt: DataType, v: Any): Option[Any] = (dt, v) match {
    case (_, null) => None
    case (IntegerType, i: java.lang.Integer) => Some(i.longValue)
    case (IntegerType, s: java.lang.Short) => Some(s.longValue)
    case (IntegerType, b: java.lang.Byte) => Some(b.longValue)
    case (LongType, l: java.lang.Long) => Some(l.longValue)
    case (LongType, i: java.lang.Integer) => Some(i.longValue)
    case (DateType, d: java.sql.Date) => Some(DateTimeUtils.fromJavaDate(d).toLong)
    case (DateType, ld: java.time.LocalDate) => Some(ld.toEpochDay)
    case (TimestampType, t: java.sql.Timestamp) => Some(DateTimeUtils.fromJavaTimestamp(t))
    case (TimestampType, i: java.time.Instant) => Some(DateTimeUtils.instantToMicros(i))
    case (TimestampNTZType, ldt: java.time.LocalDateTime) => Some(DateTimeUtils.localDateTimeToMicros(ldt))
    case (DoubleType, d: java.lang.Double) => Some(sortableDouble(d))
    case (FloatType, f: java.lang.Float) => Some(sortableFloat(f))
    case (dec: DecimalType, bd: java.math.BigDecimal)
        if dec.precision <= Decimal.MAX_LONG_DIGITS =>
      decimalCanon(dec, bd).map(identity[Any])
    case (dec: DecimalType, d: Decimal)
        if dec.precision <= Decimal.MAX_LONG_DIGITS =>
      decimalCanon(dec, d.toJavaBigDecimal).map(identity[Any])
    case (StringType, s: String) => Some(s)
    case (StringType, u: UTF8String) => Some(u.toString)
    case _ => None
  }

  /** Total order on canonical values of one type. Strings compare in UTF-8
    * binary order (Spark's own string ordering), not UTF-16 — fixing the
    * reference's Java-String-ordering wrinkle (SURVEY.md §7.5). */
  def compare(a: Any, b: Any): Int = (a, b) match {
    case (x: Long, y: Long) => java.lang.Long.compare(x, y)
    case (x: String, y: String) =>
      UTF8String.fromString(x).binaryCompare(UTF8String.fromString(y))
    case _ => throw new IllegalArgumentException(s"incomparable: $a vs $b")
  }
}

/** Per-(row-group × column) statistics, canonical-valued.
  *
  * `min`/`max` are None either when the chunk holds no non-null values or
  * when the footer carried no usable statistics; `nullCount` is None when
  * unknown. The verdict helpers below distinguish those cases via the
  * block's rowCount. Mirrors ColumnStatistics.scala:26-160 semantics with
  * footer-derived values (SURVEY.md §7.1 design delta #2).
  */
case class ColumnStats(
    min: Option[Any],
    max: Option[Any],
    nullCount: Option[Long]) {

  /** True when we know the chunk contains zero non-null values. */
  def knownAllNull(rowCount: Long): Boolean =
    min.isEmpty && nullCount.contains(rowCount)

  def hasNull: Boolean = nullCount.forall(_ > 0) // unknown → may have nulls

  /** May this chunk contain value v (canonical, non-null)?
    * Reference: ColumnStatistics.contains, null-tolerant (:97-102). */
  def mayContain(v: Any, rowCount: Long): Boolean =
    (min, max) match {
      case (Some(lo), Some(hi)) =>
        Canon.compare(v, lo) >= 0 && Canon.compare(v, hi) <= 0
      case _ => !knownAllNull(rowCount) // unknown stats → maybe
    }
}

/** Statistics for one Parquet row group. */
case class BlockStats(rowCount: Long, columns: Map[String, ColumnStats])

/** The pruning verdict algebra: fold a pushed `sources.Filter` against one
  * file's per-block statistics plus optional per-(file × column) membership
  * sketches, producing a may-contain verdict. A file is scanned iff any of
  * its blocks may contain a matching row; empty files (0 blocks) are always
  * pruned (reference ParquetIndexFilters.scala:29-46,43-45).
  *
  * Deliberate deltas vs the reference fold (ParquetIndexFilters.scala:52-138):
  *   - the whole tree folds per block and ORs across blocks, so
  *     `And(a, b)` must hold within a single block — strictly stronger
  *     pruning than the reference's per-leaf OR, still sound;
  *   - `Not` never folds through a non-constant child: the reference maps
  *     Not(Trivial(true)) → Trivial(false), which turns "may contain" into
  *     "definitely absent" and can wrongly prune; we return true instead.
  */
object FilterFold {

  /** Does the tree contain a verdict that can consult a membership
    * sketch (EqualTo/In/EqualNullSafe)? Callers skip sketch IO when not. */
  def usesMembership(filter: Filter): Boolean = filter match {
    case _: EqualTo | _: In | _: EqualNullSafe => true
    case And(l, r) => usesMembership(l) || usesMembership(r)
    case Or(l, r) => usesMembership(l) || usesMembership(r)
    case Not(c) => usesMembership(c)
    case _ => false
  }

  /** Does the tree contain a substring predicate (Contains/EndsWith)?
    * Only an EXACT dictionary sketch can answer those — callers must not
    * load bloom/bitmap sketches for a substring-only tree (IO with zero
    * pruning power). */
  def usesSubstring(filter: Filter): Boolean = filter match {
    case _: StringContains | _: StringEndsWith => true
    case And(l, r) => usesSubstring(l) || usesSubstring(r)
    case Or(l, r) => usesSubstring(l) || usesSubstring(r)
    case Not(c) => usesSubstring(c)
    case _ => false
  }

  /** @param sketchFor (column) → sketch for this file, if built */
  def fileMayContain(
      filter: Filter,
      blocks: Seq[BlockStats],
      sketchFor: String => Option[Sketch],
      schema: StructType): Boolean = {
    if (blocks.isEmpty) false
    else blocks.exists(b => blockMayContain(filter, b, sketchFor, schema))
  }

  def blockMayContain(
      filter: Filter,
      block: BlockStats,
      sketchFor: String => Option[Sketch],
      schema: StructType): Boolean = {

    def dtOf(attr: String): Option[DataType] =
      schema.fields.find(_.name.equalsIgnoreCase(attr)).map(_.dataType)

    def eqVerdict(attr: String, value: Any): Boolean = {
      if (value == null) return nullVerdict(attr)
      val verdict = for {
        dt <- dtOf(attr)
        canon <- Canon.fromExternal(dt, value)
      } yield {
        val rangeOk = block.columns.get(attr) match {
          case Some(st) => st.mayContain(canon, block.rowCount)
          case None => true // column not indexed in this block
        }
        // Sketch covers the whole file (superset of this block) — sound to
        // consult for any block. Stats-range AND sketch, as the reference
        // (ParquetIndexFilters.scala:54-64).
        rangeOk && sketchFor(attr).forall(_.mightContain(canon))
      }
      verdict.getOrElse(true)
    }

    def nullVerdict(attr: String): Boolean =
      block.columns.get(attr).forall(_.hasNull)

    // Prefix pruning (improvement over the reference, which always scans
    // on StringStartsWith): any s with prefix p satisfies
    // bytes(p) <= bytes(s) < successor(bytes(p)) in unsigned
    // lexicographic (UTF-8 binary) order, so the block may match iff
    // [min, max] intersects that range. Comparison happens at the BYTE
    // level because the successor (last non-0xFF byte bumped) need not be
    // valid UTF-8.
    def prefixVerdict(attr: String, prefix: String): Boolean = {
      val verdict = for {
        dt <- dtOf(attr)
        if dt == StringType
        st <- block.columns.get(attr)
      } yield {
        if (st.min.isEmpty) !st.knownAllNull(block.rowCount)
        else {
          val (p, succ) = FilterFold.prefixBounds(prefix)
          val minB = st.min.get.asInstanceOf[String]
            .getBytes(java.nio.charset.StandardCharsets.UTF_8)
          val maxB = st.max.get.asInstanceOf[String]
            .getBytes(java.nio.charset.StandardCharsets.UTF_8)
          val geOk = FilterFold.unsignedCompare(p, maxB) <= 0
          val ltOk = succ match {
            case Some(up) => FilterFold.unsignedCompare(minB, up) < 0
            case None => true // prefix is all 0xFF: no upper bound
          }
          geOk && ltOk
        }
      }
      verdict.getOrElse(true)
    }

    def substringVerdict(attr: String, pred: String => Boolean): Boolean = {
      val blockOk = block.columns.get(attr)
        .forall(st => !st.knownAllNull(block.rowCount))
      blockOk && (dtOf(attr) match {
        case Some(StringType) => sketchFor(attr).forall(_.mightContainMatching(pred))
        case _ => true // non-string or unknown column: not our predicate
      })
    }

    def rangeVerdict(attr: String, value: Any)(cmp: (Any, ColumnStats) => Boolean): Boolean = {
      val verdict = for {
        dt <- dtOf(attr)
        canon <- Canon.fromExternal(dt, value)
        st <- block.columns.get(attr)
      } yield {
        if (st.min.isDefined) cmp(canon, st)
        else !st.knownAllNull(block.rowCount) // no stats → maybe; all-null → no
      }
      verdict.getOrElse(true)
    }

    filter match {
      case EqualTo(a, v) => eqVerdict(a, v)
      case EqualNullSafe(a, null) => nullVerdict(a)
      case EqualNullSafe(a, v) => eqVerdict(a, v)
      case In(a, vs) => vs != null && vs.exists(eqVerdict(a, _))
      case IsNull(a) => nullVerdict(a)
      // v strictly greater than max, or equal to it, cannot satisfy `> v`
      // (reference :80-85); analogous boundary rules below.
      case GreaterThan(a, v) =>
        rangeVerdict(a, v)((c, st) => Canon.compare(c, st.max.get) < 0)
      case GreaterThanOrEqual(a, v) =>
        rangeVerdict(a, v)((c, st) => Canon.compare(c, st.max.get) <= 0)
      case LessThan(a, v) =>
        rangeVerdict(a, v)((c, st) => Canon.compare(c, st.min.get) > 0)
      case LessThanOrEqual(a, v) =>
        rangeVerdict(a, v)((c, st) => Canon.compare(c, st.min.get) >= 0)
      case And(l, r) =>
        blockMayContain(l, block, sketchFor, schema) &&
          blockMayContain(r, block, sketchFor, schema)
      case Or(l, r) =>
        blockMayContain(l, block, sketchFor, schema) ||
          blockMayContain(r, block, sketchFor, schema)
      case Not(_: AlwaysTrue) => false
      case Not(_: AlwaysFalse) => true
      case _: AlwaysTrue => true
      case _: AlwaysFalse => false
      // Improvements over the reference (which scans on both): a block
      // known to hold only nulls cannot satisfy IsNotNull, and prefix
      // predicates prune by byte range.
      case IsNotNull(a) =>
        block.columns.get(a).forall(st => !st.knownAllNull(block.rowCount))
      case StringStartsWith(a, p) if p != null => prefixVerdict(a, p)
      // Substring predicates: min/max ranges can't answer them, but an
      // EXACT dictionary sketch enumerates the file's string values, so
      // the file is prunable iff no dict value matches (improvement over
      // the reference, which always scans). An all-null file has an empty
      // dict → prunes (NULL never satisfies Contains/EndsWith). A block
      // known all-null can't match either, even with a file-level dict hit.
      case StringContains(a, sub) if sub != null =>
        substringVerdict(a, _.contains(sub))
      case StringEndsWith(a, suffix) if suffix != null =>
        substringVerdict(a, _.endsWith(suffix))
      // Not(…), anything else: scan the file (reference :128-137).
      case _ => true
    }
  }

  /** (prefix bytes, successor bound) memo — pure function of the filter,
    * evaluated per block in the pruning hot path; queries use a handful
    * of distinct prefixes, so a small bounded cache removes the repeated
    * encode + successor allocations across 100k-file folds. */
  private val prefixBoundsCache =
    new java.util.concurrent.ConcurrentHashMap[String, (Array[Byte], Option[Array[Byte]])]()

  private[index] def prefixBounds(prefix: String): (Array[Byte], Option[Array[Byte]]) = {
    if (prefixBoundsCache.size > 1024) prefixBoundsCache.clear()
    prefixBoundsCache.computeIfAbsent(prefix, { p =>
      val bytes = p.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      (bytes, successorBytes(bytes))
    })
  }

  /** Unsigned lexicographic byte comparison (= UTF8String.binaryCompare). */
  private[index] def unsignedCompare(a: Array[Byte], b: Array[Byte]): Int = {
    val n = math.min(a.length, b.length)
    var i = 0
    while (i < n) {
      val cmp = (a(i) & 0xFF) - (b(i) & 0xFF)
      if (cmp != 0) return cmp
      i += 1
    }
    a.length - b.length
  }

  /** Least byte string strictly greater than every string with prefix
    * `p`: bump the last non-0xFF byte and truncate; None if all 0xFF. */
  private[index] def successorBytes(p: Array[Byte]): Option[Array[Byte]] = {
    var i = p.length - 1
    while (i >= 0 && p(i) == 0xFF.toByte) i -= 1
    if (i < 0) None
    else {
      val out = java.util.Arrays.copyOf(p, i + 1)
      out(i) = (out(i) + 1).toByte
      Some(out)
    }
  }
}
