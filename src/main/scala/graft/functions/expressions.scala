package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.SparkInternals
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the similarity/dedup hot kernels.
  *
  * The same semantics are expressible with `zip_with`/`aggregate`
  * higher-order functions, but HOF lambdas evaluate interpreted
  * per-element — at millions of (pair × dimension) steps that dominates
  * the runtime. These evals run the tight loop in JVM code instead
  * (~100× per-element). CodegenFallback keeps them usable inside
  * whole-stage codegen plans; doGenCode is a future sharpening.
  */

/** xxhash64 of a UTF8String with an explicit seed (Spark's xxhash64
  * function fixes seed=42; MinHash needs the two-hash trick). */
private object Hashing {
  def hash(s: UTF8String, seed: Long): Long =
    XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, seed)

  private val md5TL = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Little-endian long of MD5 digest bytes 8..15 — bit-identical to
    * DuckDB's `md5_number_lower`, which makes simhash fingerprints
    * replicable by an external SQL oracle. */
  def md5Lower64(s: UTF8String): Long = {
    val md = md5TL.get()
    md.reset()
    val d = md.digest(s.getBytes)
    var h = 0L
    var i = 15
    while (i >= 8) { h = (h << 8) | (d(i) & 0xffL); i -= 1 }
    h
  }
}

/** Normalize + tokenize in one pass: lowercase, then split on runs of
  * bytes outside [a-z0-9]. Byte-level equivalent of
  * `split(trim(regexp_replace(regexp_replace(lower(c),'[^a-z0-9 ]',' '),' +',' ')), ' ')`
  * — every non-alphanumeric character (multi-byte included) becomes a
  * separator and separator runs collapse, so the token streams are
  * identical while skipping two regex passes per document. */
case class Tokenize(child: Expression)
  extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    val lowered = input.asInstanceOf[UTF8String].toLowerCase
    val bytes = lowered.getBytes
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    var i = 0
    val n = bytes.length
    while (i < n) {
      val b = bytes(i)
      if ((b >= 'a' && b <= 'z') || (b >= '0' && b <= '9')) {
        val start = i
        while (i < n && {
          val c = bytes(i); (c >= 'a' && c <= 'z') || (c >= '0' && c <= '9')
        }) i += 1
        out += UTF8String.fromBytes(java.util.Arrays.copyOfRange(bytes, start, i))
      } else i += 1
    }
    new GenericArrayData(out.toArray)
  }

  override protected def withNewChildInternal(c: Expression): Tokenize = copy(child = c)
}

/** Count of array elements contained in a fixed string set (codegen-free
  * replacement for `size(filter(tokens, t => array_contains(lits, t)))`,
  * whose lambda evaluates interpreted per token). */
case class CountInSet(child: Expression, words: Seq[String])
  extends UnaryExpression with CodegenFallback {

  private lazy val set: java.util.HashSet[UTF8String] = {
    val s = new java.util.HashSet[UTF8String](words.size * 2)
    words.foreach(w => s.add(UTF8String.fromString(w)))
    s
  }

  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    var count = 0
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      if (!arr.isNullAt(i) && set.contains(arr.getUTF8String(i))) count += 1
      i += 1
    }
    java.lang.Integer.valueOf(count)
  }

  override protected def withNewChildInternal(c: Expression): CountInSet = copy(child = c)
}

/** k-word shingles of a token array: element i = tokens[i..i+k) joined by
  * a single space; fewer than k tokens collapse to one whole-text shingle.
  * (The transform/slice/concat_ws HOF formulation evaluates interpreted
  * per position — ~40µs each; this loop is ~100× faster.) */
case class WordShingles(child: Expression, k: Int)
  extends UnaryExpression with CodegenFallback {

  private val space = UTF8String.fromString(" ")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val toks = new Array[UTF8String](n)
    var i = 0
    while (i < n) {
      toks(i) = if (arr.isNullAt(i)) UTF8String.EMPTY_UTF8 else arr.getUTF8String(i)
      i += 1
    }
    if (n <= k) {
      new GenericArrayData(Array[Any](UTF8String.concatWs(space, toks: _*)))
    } else {
      val out = new Array[Any](n - k + 1)
      var s = 0
      while (s <= n - k) {
        val window = new Array[UTF8String](k)
        System.arraycopy(toks, s, window, 0, k)
        out(s) = UTF8String.concatWs(space, window: _*)
        s += 1
      }
      new GenericArrayData(out)
    }
  }

  override protected def withNewChildInternal(c: Expression): WordShingles = copy(child = c)
}

/** MinHash signature of a string array: sig(i) = min over elements of
  * (h1 + i*h2) — the standard universal-hash composition, one xxhash64
  * pair per element instead of numHashes full hashes. */
case class MinHashSignature(child: Expression, numHashes: Int)
  extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val sig = Array.fill(numHashes)(Long.MaxValue)
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val s = arr.getUTF8String(i)
        val h1 = Hashing.hash(s, 42L)
        val h2 = Hashing.hash(s, 0x9747b28cL)
        var k = 0
        while (k < numHashes) {
          val v = h1 + k * h2
          if (v < sig(k)) sig(k) = v
          k += 1
        }
      }
      i += 1
    }
    new GenericArrayData(sig)
  }

  override protected def withNewChildInternal(c: Expression): MinHashSignature = copy(child = c)
}

/** 64-bit SimHash of a string array (token list): per element hash, each
  * bit votes ±1, fingerprint bit = sign of the vote sum.
  *
  * `algo` selects the token hash: "xx" (xxhash64, fastest — default) or
  * "md5" (lower 8 digest bytes, little-endian = DuckDB md5_number_lower,
  * so an external SQL engine can reproduce fingerprints exactly). */
case class SimHash64(child: Expression, algo: String = "xx")
  extends UnaryExpression with CodegenFallback {

  require(algo == "xx" || algo == "md5", s"unknown simhash token hash: $algo")

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val votes = new Array[Int](64)
    val md5 = algo == "md5"
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val tok = arr.getUTF8String(i)
        val h = if (md5) Hashing.md5Lower64(tok) else Hashing.hash(tok, 42L)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var fp = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) fp |= (1L << b)
      b += 1
    }
    java.lang.Long.valueOf(fp)
  }

  override protected def withNewChildInternal(c: Expression): SimHash64 = copy(child = c)
}

object SimHash64 {
  /** Dotted-eval helper for tests: simhash of a token seq, JVM-side. */
  def of(tokens: Seq[String], algo: String = "xx"): Long = {
    val votes = new Array[Int](64)
    tokens.foreach { t =>
      val u = UTF8String.fromString(t)
      val h = if (algo == "md5") Hashing.md5Lower64(u) else Hashing.hash(u, 42L)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
    }
    var fp = 0L
    var b = 0
    while (b < 64) { if (votes(b) > 0) fp |= (1L << b); b += 1 }
    fp
  }
}

private object VecOps {
  /** Read element i of a numeric array as double. */
  @inline def get(arr: ArrayData, et: DataType, i: Int): Double = et match {
    case FloatType => arr.getFloat(i).toDouble
    case DoubleType => arr.getDouble(i)
    case IntegerType => arr.getInt(i).toDouble
    case LongType => arr.getLong(i).toDouble
    case d: DecimalType => arr.getDecimal(i, d.precision, d.scale).toDouble
    case _ => throw new IllegalArgumentException(s"numeric array expected, got $et")
  }

  def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType
}

/** Dot product of two numeric arrays in double precision, accumulating
  * left-to-right (bit-identical to the zip_with/aggregate formulation and
  * to a sequential SQL list_sum). */
case class DotProduct(left: Expression, right: Expression)
  extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val etx = VecOps.elemType(left)
    val ety = VecOps.elemType(right)
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += VecOps.get(x, etx, i) * VecOps.get(y, ety, i)
      i += 1
    }
    java.lang.Double.valueOf(acc)
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): DotProduct =
    copy(left = l, right = r)
}

/** Sum of squares (squared L2 norm) of a numeric array, left-to-right. */
case class NormSquared(child: Expression)
  extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    val x = input.asInstanceOf[ArrayData]
    val et = VecOps.elemType(child)
    var acc = 0.0
    var i = 0
    val n = x.numElements()
    while (i < n) {
      val v = VecOps.get(x, et, i)
      acc += v * v
      i += 1
    }
    java.lang.Double.valueOf(acc)
  }

  override protected def withNewChildInternal(c: Expression): NormSquared = copy(child = c)
}

/** Column-level wrappers. */
object exprs {
  def tokenize(text: Column): Column =
    SparkInternals.wrap(Tokenize(SparkInternals.unwrap(text)))
  def count_in_set(tokens: Column, words: Seq[String]): Column =
    SparkInternals.wrap(CountInSet(SparkInternals.unwrap(tokens), words))
  def word_shingles(tokens: Column, k: Int): Column =
    SparkInternals.wrap(WordShingles(SparkInternals.unwrap(tokens), k))
  def minhash_signature(tokens: Column, numHashes: Int): Column =
    SparkInternals.wrap(MinHashSignature(SparkInternals.unwrap(tokens), numHashes))
  def simhash64(tokens: Column, algo: String = "xx"): Column =
    SparkInternals.wrap(SimHash64(SparkInternals.unwrap(tokens), algo))
  def dot_product(a: Column, b: Column): Column =
    SparkInternals.wrap(DotProduct(SparkInternals.unwrap(a), SparkInternals.unwrap(b)))
  def norm_squared(a: Column): Column =
    SparkInternals.wrap(NormSquared(SparkInternals.unwrap(a)))
}
