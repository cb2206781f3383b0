package graft.index

import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Unit tests for the pruning verdict algebra (reference
  * ParquetIndexFiltersSuite semantics, SURVEY.md §2.2) plus a ScalaCheck
  * soundness property: a false verdict must imply no matching rows. */
class FilterFoldSpec extends AnyFunSuite {

  private val schema = StructType(Seq(
    StructField("a", LongType),
    StructField("s", StringType)))

  private def noSketch: String => Option[Sketch] = _ => None

  private def block(rows: Long, aMin: Long, aMax: Long, aNulls: Long = 0): BlockStats =
    BlockStats(rows, Map("a" -> ColumnStats(Some(aMin), Some(aMax), Some(aNulls))))

  private def verdict(f: Filter, blocks: Seq[BlockStats]): Boolean =
    FilterFold.fileMayContain(f, blocks, noSketch, schema)

  test("empty file (0 blocks) always prunes") {
    assert(!verdict(EqualTo("a", 1L), Nil))
    assert(!verdict(IsNull("a"), Nil))
  }

  test("equality against min/max range") {
    val b = Seq(block(10, 5L, 10L))
    assert(verdict(EqualTo("a", 5L), b))
    assert(verdict(EqualTo("a", 7L), b))
    assert(verdict(EqualTo("a", 10L), b))
    assert(!verdict(EqualTo("a", 4L), b))
    assert(!verdict(EqualTo("a", 11L), b))
  }

  test("boundary rules for ranges (reference :80-101)") {
    val b = Seq(block(10, 5L, 10L))
    assert(!verdict(GreaterThan("a", 10L), b)) // v == max excluded
    assert(verdict(GreaterThan("a", 9L), b))
    assert(verdict(GreaterThanOrEqual("a", 10L), b))
    assert(!verdict(GreaterThanOrEqual("a", 11L), b))
    assert(!verdict(LessThan("a", 5L), b)) // v == min excluded
    assert(verdict(LessThan("a", 6L), b))
    assert(verdict(LessThanOrEqual("a", 5L), b))
    assert(!verdict(LessThanOrEqual("a", 4L), b))
  }

  test("null semantics") {
    assert(verdict(IsNull("a"), Seq(block(10, 5L, 10L, aNulls = 1))))
    assert(!verdict(IsNull("a"), Seq(block(10, 5L, 10L, aNulls = 0))))
    // all-null chunk: no non-null values, equality cannot match
    val allNull = Seq(BlockStats(10, Map("a" -> ColumnStats(None, None, Some(10)))))
    assert(!verdict(EqualTo("a", 1L), allNull))
    assert(verdict(IsNull("a"), allNull))
  }

  test("substring predicates consult an exact dict sketch") {
    val dict = Sketch.create(Sketch.Dict, 10)
    dict.put("ECONOMY"); dict.put("PROMO")
    val withDict: String => Option[Sketch] =
      c => if (c == "s") Some(dict) else None
    val b = Seq(BlockStats(5,
      Map("s" -> ColumnStats(Some("ECONOMY"), Some("PROMO"), Some(0)))))

    assert(FilterFold.fileMayContain(StringContains("s", "CONOM"), b, withDict, schema))
    assert(!FilterFold.fileMayContain(StringContains("s", "STANDARD"), b, withDict, schema))
    assert(FilterFold.fileMayContain(StringEndsWith("s", "OMO"), b, withDict, schema))
    assert(!FilterFold.fileMayContain(StringEndsWith("s", "XYZ"), b, withDict, schema))
    // no sketch → cannot prune
    assert(FilterFold.fileMayContain(StringContains("s", "STANDARD"), b, noSketch, schema))
    // bloom sketch → cannot answer substring, conservative
    val bloom = Sketch.create(Sketch.Bloom, 10)
    bloom.put("ECONOMY")
    assert(FilterFold.fileMayContain(StringContains("s", "STANDARD"), b,
      c => if (c == "s") Some(bloom) else None, schema))
    // all-null block cannot satisfy a substring predicate even w/o sketch
    val allNull = Seq(BlockStats(5, Map("s" -> ColumnStats(None, None, Some(5)))))
    assert(!FilterFold.fileMayContain(StringContains("s", "E"), allNull, noSketch, schema))
    // substring predicates gate sketch IO separately from equality
    // membership (only an exact dict can answer them)
    assert(FilterFold.usesSubstring(StringContains("s", "x")))
    assert(FilterFold.usesSubstring(Or(StringEndsWith("s", "x"), EqualTo("a", 1L))))
    assert(!FilterFold.usesMembership(StringContains("s", "x")))
    assert(!FilterFold.usesSubstring(EqualTo("a", 1L)))
  }

  test("unknown stats are conservative") {
    val unknown = Seq(BlockStats(10, Map("a" -> ColumnStats(None, None, None))))
    assert(verdict(EqualTo("a", 1L), unknown))
    assert(verdict(GreaterThan("a", 99L), unknown))
    assert(verdict(IsNull("a"), unknown))
  }

  test("unindexed attribute and unsupported filters scan the file") {
    val b = Seq(block(10, 5L, 10L))
    assert(verdict(EqualTo("zzz", 1L), b))
    assert(verdict(IsNotNull("a"), b))
    assert(verdict(StringStartsWith("s", "x"), b))
  }

  test("isNotNull prunes known-all-null blocks (improvement over reference)") {
    val allNull = Seq(BlockStats(10, Map("a" -> ColumnStats(None, None, Some(10)))))
    assert(!verdict(IsNotNull("a"), allNull))
    assert(verdict(IsNotNull("a"), Seq(block(10, 5L, 10L))))
    val unknown = Seq(BlockStats(10, Map("a" -> ColumnStats(None, None, None))))
    assert(verdict(IsNotNull("a"), unknown))
  }

  test("prefix pruning by byte range (improvement over reference)") {
    val b = Seq(BlockStats(3,
      Map("s" -> ColumnStats(Some("mm"), Some("pp"), Some(0)))))
    assert(verdict(StringStartsWith("s", "m"), b))
    assert(verdict(StringStartsWith("s", "n"), b))
    assert(verdict(StringStartsWith("s", "p"), b))
    assert(verdict(StringStartsWith("s", "mm"), b))
    assert(!verdict(StringStartsWith("s", "a"), b), "succ('a')='b' <= min")
    assert(!verdict(StringStartsWith("s", "q"), b), "'q' > max")
    assert(!verdict(StringStartsWith("s", "pq"), b), "'pq' > max 'pp'")
    assert(verdict(StringStartsWith("s", ""), b), "empty prefix matches anything")
    // multi-byte stats: é = C3 A9
    val utf = Seq(BlockStats(2,
      Map("s" -> ColumnStats(Some("é1"), Some("é9"), Some(0)))))
    assert(verdict(StringStartsWith("s", "é"), utf))
    assert(!verdict(StringStartsWith("s", "f"), utf), "'f' (0x66) < 0xC3 range")
  }

  test("prefix soundness: verdict=false implies no string matches") {
    val charGen = Gen.oneOf('a', 'b', 'z', 'é', '日', '0')
    val strGen = Gen.listOf(charGen).map(_.mkString)
    val prop = Prop.forAll(Gen.nonEmptyListOf(strGen), strGen) { (values, prefix) =>
      val sorted = values.sortWith(Canon.compare(_, _) < 0)
      val blocks = Seq(BlockStats(values.size.toLong,
        Map("s" -> ColumnStats(Some(sorted.head), Some(sorted.last), Some(0)))))
      val v = FilterFold.fileMayContain(
        StringStartsWith("s", prefix), blocks, noSketch, schema)
      v || !values.exists(_.startsWith(prefix))
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(500), prop)
    assert(res.passed, res.status.toString)
  }

  test("And must hold within one block; Or across") {
    val blocks = Seq(block(10, 0L, 10L), block(10, 100L, 110L))
    // 5 and 105 in different blocks — And prunes (stronger than reference)
    assert(!verdict(And(EqualTo("a", 5L), EqualTo("a", 105L)), blocks))
    assert(verdict(Or(EqualTo("a", 5L), EqualTo("a", 105L)), blocks))
    assert(verdict(And(GreaterThan("a", 3L), LessThan("a", 8L)), blocks))
  }

  test("Not never wrongly prunes (delta vs reference)") {
    val b = Seq(block(10, 5L, 10L))
    // block contains values != 7 too — must scan
    assert(verdict(Not(EqualTo("a", 7L)), b))
    assert(!verdict(Not(AlwaysTrue()), b))
    assert(verdict(Not(AlwaysFalse()), b))
  }

  test("In: existential, empty array prunes") {
    val b = Seq(block(10, 5L, 10L))
    assert(verdict(In("a", Array[Any](1L, 7L)), b))
    assert(!verdict(In("a", Array[Any](1L, 2L)), b))
    assert(!verdict(In("a", Array.empty[Any]), b))
  }

  test("string stats compare in UTF-8 binary order") {
    val b = Seq(BlockStats(3,
      Map("s" -> ColumnStats(Some("aa"), Some("bb"), Some(0)))))
    assert(FilterFold.fileMayContain(EqualTo("s", "ab"), b, noSketch, schema))
    assert(!FilterFold.fileMayContain(EqualTo("s", "ca"), b, noSketch, schema))
    assert(!FilterFold.fileMayContain(EqualTo("s", "a"), b, noSketch, schema))
  }

  test("sketch sharpens equality but not ranges") {
    val sketch = Sketch.create(Sketch.Dict, 16)
    sketch.put(7L)
    val withSketch: String => Option[Sketch] =
      c => if (c == "a") Some(sketch) else None
    val b = Seq(block(10, 5L, 10L))
    assert(FilterFold.fileMayContain(EqualTo("a", 7L), b, withSketch, schema))
    // 6 is in range but not in the dict → pruned
    assert(!FilterFold.fileMayContain(EqualTo("a", 6L), b, withSketch, schema))
    // ranges ignore sketches
    assert(FilterFold.fileMayContain(GreaterThan("a", 6L), b, withSketch, schema))
  }

  // ---- soundness property ---------------------------------------------

  private val valueGen = Gen.chooseNum(-50L, 50L)
  private val rowsGen = Gen.nonEmptyListOf(Gen.option(valueGen))

  private def leafGen: Gen[Filter] = Gen.oneOf(
    valueGen.map(v => EqualTo("a", v)),
    valueGen.map(v => GreaterThan("a", v)),
    valueGen.map(v => GreaterThanOrEqual("a", v)),
    valueGen.map(v => LessThan("a", v)),
    valueGen.map(v => LessThanOrEqual("a", v)),
    Gen.listOf(valueGen).map(vs => In("a", vs.map(_.asInstanceOf[Any]).toArray)),
    Gen.const(IsNull("a")))

  private def filterGen(depth: Int): Gen[Filter] =
    if (depth == 0) leafGen
    else Gen.oneOf(
      leafGen,
      Gen.zip(filterGen(depth - 1), filterGen(depth - 1)).map { case (l, r) => And(l, r) },
      Gen.zip(filterGen(depth - 1), filterGen(depth - 1)).map { case (l, r) => Or(l, r) },
      filterGen(depth - 1).map(Not))

  private def rowMatches(f: Filter, v: Option[Long]): Boolean = f match {
    case EqualTo("a", x) => v.contains(x.asInstanceOf[Long])
    case GreaterThan("a", x) => v.exists(_ > x.asInstanceOf[Long])
    case GreaterThanOrEqual("a", x) => v.exists(_ >= x.asInstanceOf[Long])
    case LessThan("a", x) => v.exists(_ < x.asInstanceOf[Long])
    case LessThanOrEqual("a", x) => v.exists(_ <= x.asInstanceOf[Long])
    case In("a", xs) => v.exists(x => xs.contains(x))
    case IsNull("a") => v.isEmpty
    case And(l, r) => rowMatches(l, v) && rowMatches(r, v)
    case Or(l, r) => rowMatches(l, v) || rowMatches(r, v)
    case Not(c) => !rowMatches(c, v)
    case _ => true
  }

  test("substring soundness: dict verdict=false implies no string matches") {
    val sGen = Gen.listOf(Gen.oneOf('a', 'b', 'c', 'é')).map(_.mkString)
    val prop = Prop.forAll(
      Gen.nonEmptyListOf(Gen.option(sGen)), sGen, Gen.oneOf(0, 1, 2)) {
      (rows, needle, kind) =>
        val nonNull = rows.flatten
        val dict = Sketch.create(Sketch.Dict, 16)
        nonNull.foreach(dict.put)
        val stats =
          if (nonNull.isEmpty) ColumnStats(None, None, Some(rows.size.toLong))
          else {
            val sorted = nonNull.sortWith(Canon.compare(_, _) < 0)
            ColumnStats(Some(sorted.head), Some(sorted.last),
              Some(rows.count(_.isEmpty).toLong))
          }
        val blocks = Seq(BlockStats(rows.size.toLong, Map("s" -> stats)))
        val f: Filter = kind match {
          case 0 => StringContains("s", needle)
          case 1 => StringEndsWith("s", needle)
          case _ => StringStartsWith("s", needle)
        }
        val v = FilterFold.fileMayContain(
          f, blocks, c => if (c == "s") Some(dict) else None, schema)
        val anyMatch = nonNull.exists { s =>
          kind match {
            case 0 => s.contains(needle)
            case 1 => s.endsWith(needle)
            case _ => s.startsWith(needle)
          }
        }
        v || !anyMatch
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(500), prop)
    assert(res.passed, res.status.toString)
  }

  test("soundness: verdict=false implies no row in the file matches") {
    val prop = Prop.forAll(rowsGen, filterGen(3)) { (rows, f) =>
      // build footer-accurate stats for the single block
      val nonNull = rows.flatten
      val stats =
        if (nonNull.isEmpty) ColumnStats(None, None, Some(rows.size.toLong))
        else ColumnStats(Some(nonNull.min), Some(nonNull.max),
          Some(rows.count(_.isEmpty).toLong))
      val blocks = Seq(BlockStats(rows.size.toLong, Map("a" -> stats)))
      val v = FilterFold.fileMayContain(f, blocks, noSketch, schema)
      v || !rows.exists(r => rowMatches(f, r))
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(500), prop)
    assert(res.passed, res.status.toString)
  }

  // ---- double/float/decimal domain (IEEE754 sortable-bits canonical) ---

  /** Spark SQL double comparison (SQLOrderingUtil): -0.0 == 0.0, NaN
    * greatest and equal to itself. */
  private def sqlCmp(a: Double, b: Double): Int =
    if (a == b) 0 else java.lang.Double.compare(a, b)

  test("sortable bits: Long order == Spark SQL double order; round-trips") {
    val specials = Seq(Double.NegativeInfinity, -Double.MaxValue, -1.5,
      -Double.MinPositiveValue, -0.0, 0.0, Double.MinPositiveValue, 1.5,
      Double.MaxValue, Double.PositiveInfinity, Double.NaN)
    for (a <- specials; b <- specials) {
      val c = java.lang.Long.compare(Canon.sortableDouble(a), Canon.sortableDouble(b))
      assert(Integer.signum(c) == Integer.signum(sqlCmp(a, b)), s"$a vs $b")
    }
    for (d <- specials if !d.isNaN && d != -0.0) {
      assert(Canon.sortableToDouble(Canon.sortableDouble(d)) == d, s"round trip $d")
    }
    assert(Canon.sortableToDouble(Canon.sortableDouble(Double.NaN)).isNaN)
    assert(Canon.sortableDouble(-0.0) == Canon.sortableDouble(0.0))
    // float twin
    assert(Canon.sortableToFloat(Canon.sortableFloat(-3.25f)) == -3.25f)
    assert(Canon.sortableFloat(-0.0f) == Canon.sortableFloat(0.0f))
    assert(Canon.sortableFloat(1.5f) < Canon.sortableFloat(Float.NaN))
  }

  test("decimal canonical: unscaled-long round-trip and lossy rescale bail") {
    val dt = DecimalType(10, 2)
    assert(Canon.decimalCanon(dt, new java.math.BigDecimal("12.34")) === Some(1234L))
    assert(Canon.decimalCanon(dt, new java.math.BigDecimal("12.3")) === Some(1230L))
    assert(Canon.decimalCanon(dt, new java.math.BigDecimal("12.345")) === None)
    assert(Canon.fromExternal(dt, new java.math.BigDecimal("-0.01")) === Some(-1L))
    assert(Canon.isSupported(DecimalType(18, 4)))
    assert(!Canon.isSupported(DecimalType(19, 4)))
  }

  test("soundness on decimals: verdict=false implies no row matches") {
    val dt = DecimalType(10, 2)
    val decSchema = StructType(Seq(StructField("a", dt)))
    // values at the column's scale (the only values Catalyst stores)
    val vGen: Gen[java.math.BigDecimal] =
      Gen.chooseNum(-5000L, 5000L).map(u => new java.math.BigDecimal(
        java.math.BigInteger.valueOf(u), 2))
    val rowsG = Gen.nonEmptyListOf(Gen.option(vGen))
    val leaf: Gen[Filter] = Gen.oneOf(
      vGen.map(v => EqualTo("a", v)),
      vGen.map(v => GreaterThan("a", v)),
      vGen.map(v => LessThanOrEqual("a", v)),
      Gen.listOf(vGen).map(vs => In("a", vs.map(_.asInstanceOf[Any]).toArray)),
      Gen.const(IsNull("a")))
    def fGen(d: Int): Gen[Filter] =
      if (d == 0) leaf
      else Gen.oneOf(leaf,
        Gen.zip(fGen(d - 1), fGen(d - 1)).map { case (l, r) => And(l, r) },
        Gen.zip(fGen(d - 1), fGen(d - 1)).map { case (l, r) => Or(l, r) },
        fGen(d - 1).map(Not))
    def rowM(f: Filter, v: Option[java.math.BigDecimal]): Boolean = f match {
      case EqualTo("a", x) => v.exists(_.compareTo(x.asInstanceOf[java.math.BigDecimal]) == 0)
      case GreaterThan("a", x) => v.exists(_.compareTo(x.asInstanceOf[java.math.BigDecimal]) > 0)
      case LessThanOrEqual("a", x) => v.exists(_.compareTo(x.asInstanceOf[java.math.BigDecimal]) <= 0)
      case In("a", xs) => v.exists(r => xs.exists(x =>
        r.compareTo(x.asInstanceOf[java.math.BigDecimal]) == 0))
      case IsNull("a") => v.isEmpty
      case And(l, r) => rowM(l, v) && rowM(r, v)
      case Or(l, r) => rowM(l, v) || rowM(r, v)
      case Not(c) => !rowM(c, v)
      case _ => true
    }
    val prop = Prop.forAll(rowsG, fGen(3)) { (rows, f) =>
      val nonNull = rows.flatten
      val stats =
        if (nonNull.isEmpty) ColumnStats(None, None, Some(rows.size.toLong))
        else ColumnStats(
          Some(nonNull.map(Canon.decimalCanon(dt, _).get).min),
          Some(nonNull.map(Canon.decimalCanon(dt, _).get).max),
          Some(rows.count(_.isEmpty).toLong))
      val blocks = Seq(BlockStats(rows.size.toLong, Map("a" -> stats)))
      val v = FilterFold.fileMayContain(f, blocks, noSketch, decSchema)
      v || !rows.exists(r => rowM(f, r))
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(500), prop)
    assert(res.passed, res.status.toString)
  }

  test("soundness on doubles: verdict=false implies no row matches (SQL semantics)") {
    val dSchema = StructType(Seq(StructField("a", DoubleType)))
    val dGen: Gen[Double] = Gen.oneOf(
      Gen.chooseNum(-50.0, 50.0),
      Gen.oneOf(Double.NaN, Double.PositiveInfinity, Double.NegativeInfinity,
        -0.0, 0.0, 1e-300, -1e-300))
    val dRows = Gen.nonEmptyListOf(Gen.option(dGen))
    val dLeaf: Gen[Filter] = Gen.oneOf(
      dGen.map(v => EqualTo("a", v)),
      dGen.map(v => GreaterThan("a", v)),
      dGen.map(v => GreaterThanOrEqual("a", v)),
      dGen.map(v => LessThan("a", v)),
      dGen.map(v => LessThanOrEqual("a", v)),
      Gen.listOf(dGen).map(vs => In("a", vs.map(_.asInstanceOf[Any]).toArray)),
      Gen.const(IsNull("a")))
    def dFilter(depth: Int): Gen[Filter] =
      if (depth == 0) dLeaf
      else Gen.oneOf(
        dLeaf,
        Gen.zip(dFilter(depth - 1), dFilter(depth - 1)).map { case (l, r) => And(l, r) },
        Gen.zip(dFilter(depth - 1), dFilter(depth - 1)).map { case (l, r) => Or(l, r) },
        dFilter(depth - 1).map(Not))
    def rowM(f: Filter, v: Option[Double]): Boolean = f match {
      case EqualTo("a", x) => v.exists(sqlCmp(_, x.asInstanceOf[Double]) == 0)
      case GreaterThan("a", x) => v.exists(sqlCmp(_, x.asInstanceOf[Double]) > 0)
      case GreaterThanOrEqual("a", x) => v.exists(sqlCmp(_, x.asInstanceOf[Double]) >= 0)
      case LessThan("a", x) => v.exists(sqlCmp(_, x.asInstanceOf[Double]) < 0)
      case LessThanOrEqual("a", x) => v.exists(sqlCmp(_, x.asInstanceOf[Double]) <= 0)
      case In("a", xs) => v.exists(r => xs.exists(x => sqlCmp(r, x.asInstanceOf[Double]) == 0))
      case IsNull("a") => v.isEmpty
      case And(l, r) => rowM(l, v) && rowM(r, v)
      case Or(l, r) => rowM(l, v) || rowM(r, v)
      case Not(c) => !rowM(c, v)
      case _ => true
    }
    val prop = Prop.forAll(dRows, dFilter(3)) { (rows, f) =>
      val nonNull = rows.flatten
      // stats as the full-scan fallback computes them: SQL-ordered
      // min/max, canonicalized through sortable bits
      val stats =
        if (nonNull.isEmpty) ColumnStats(None, None, Some(rows.size.toLong))
        else {
          val mn = nonNull.reduce((a, b) => if (sqlCmp(a, b) <= 0) a else b)
          val mx = nonNull.reduce((a, b) => if (sqlCmp(a, b) >= 0) a else b)
          ColumnStats(Some(Canon.sortableDouble(mn)), Some(Canon.sortableDouble(mx)),
            Some(rows.count(_.isEmpty).toLong))
        }
      val blocks = Seq(BlockStats(rows.size.toLong, Map("a" -> stats)))
      val v = FilterFold.fileMayContain(f, blocks, noSketch, dSchema)
      v || !rows.exists(r => rowM(f, r))
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(500), prop)
    assert(res.passed, res.status.toString)
  }
}
