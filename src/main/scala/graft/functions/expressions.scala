package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.SparkInternals
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the similarity/dedup hot kernels.
  *
  * The same semantics are expressible with `zip_with`/`aggregate`
  * higher-order functions, but HOF lambdas evaluate interpreted
  * per-element — at millions of (pair × dimension) steps that dominates
  * the runtime. These run the tight loop in JVM code (~100× per element)
  * and participate in whole-stage codegen with a real `doGenCode`: the
  * generated code passes the (already codegen'd) child value straight to
  * the kernel — no row materialization, unlike CodegenFallback, which
  * forces an InternalRow round-trip per call. The interpreted
  * `nullSafeEval` path shares the same kernel for non-codegen contexts
  * (e.g. inside TypedImperativeAggregate.update).
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

/** Shared doGenCode shape: evaluate the child(ren) inline, call the
  * expression instance's `compute` kernel via a constant reference. */
private[functions] trait KernelUnaryCodegen { self: UnaryExpression =>
  /** Java source for one kernel invocation given the child variable. */
  protected def kernelCall(ref: String, c: String): String

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftKernel", this, getClass.getName)
    defineCodeGen(ctx, ev, c => kernelCall(ref, c))
  }
}

/** Normalize + tokenize in one pass: lowercase, then split on runs of
  * bytes outside [a-z0-9]. Byte-level equivalent of
  * `split(trim(regexp_replace(regexp_replace(lower(c),'[^a-z0-9 ]',' '),' +',' ')), ' ')`
  * — every non-alphanumeric character (multi-byte included) becomes a
  * separator and separator runs collapse, so the token streams are
  * identical while skipping two regex passes per document. */
case class Tokenize(child: Expression)
  extends UnaryExpression with KernelUnaryCodegen {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true

  def compute(input: UTF8String): ArrayData = {
    val lowered = input.toLowerCase
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

  override def nullSafeEval(input: Any): Any = compute(input.asInstanceOf[UTF8String])

  override protected def kernelCall(ref: String, c: String): String = s"$ref.compute($c)"

  override protected def withNewChildInternal(c: Expression): Tokenize = copy(child = c)
}

/** Distinct character n-grams of the CORPUS-NORMALIZED text in one
  * kernel pass — the trigram-index feeder. Normalization matches the
  * oracle regex chain (`lower` → `[^a-z0-9 ]`→space → squeeze → trim)
  * byte-wise, the same equivalence [[Tokenize]] rests on; the n-grams
  * then slide over the resulting ASCII bytes. Replaces a
  * `transform(sequence(...), i -> substring(norm, i, n))` formulation
  * whose interpreted per-element lambda re-evaluated the inlined regex
  * chain for EVERY position (O(len²) regex work per row — measured
  * 100× slowdown at sf0.1). First-occurrence order, duplicates
  * dropped. */
case class CharNgrams(child: Expression, n: Int)
  extends UnaryExpression with KernelUnaryCodegen {

  require(n >= 1, s"n must be >= 1: $n")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true

  def compute(input: UTF8String): ArrayData = {
    val bytes = input.toLowerCase.getBytes
    val norm = new Array[Byte](bytes.length)
    var m = 0
    var i = 0
    var pendingSpace = false
    while (i < bytes.length) {
      val b = bytes(i)
      if ((b >= 'a' && b <= 'z') || (b >= '0' && b <= '9')) {
        if (pendingSpace && m > 0) { norm(m) = ' '; m += 1 }
        pendingSpace = false
        norm(m) = b
        m += 1
      } else pendingSpace = true
      i += 1
    }
    if (m < n) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[UTF8String]()
    var j = 0
    while (j <= m - n) {
      seen.add(UTF8String.fromBytes(
        java.util.Arrays.copyOfRange(norm, j, j + n)))
      j += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) { out(k) = it.next(); k += 1 }
    new GenericArrayData(out)
  }

  override def nullSafeEval(input: Any): Any = compute(input.asInstanceOf[UTF8String])

  override protected def kernelCall(ref: String, c: String): String = s"$ref.compute($c)"

  override protected def withNewChildInternal(c: Expression): CharNgrams = copy(child = c)
}

/** MOSS winnowing fingerprints (Schleimer, Wilkerson & Aiken 2003,
  * "robust winnowing"): normalize like [[CharNgrams]] (lower →
  * non-[a-z0-9]→space → squeeze → trim; all-ASCII after, so byte
  * positions ARE character positions), hash every k-char gram with
  * md5-lower-64 (bit-identical to DuckDB `md5_number_lower` — the whole
  * selection is SQL-replayable), then slide a window of `w` gram hashes
  * and select the minimum per window in UNSIGNED order (DuckDB's UBIGINT
  * order), RIGHTMOST on ties. Guarantee: any substring match of at least
  * k + w − 1 normalized characters shares at least one selected
  * fingerprint; density ≈ 2/(w+1). Fewer than `w` grams collapse to one
  * whole-string window; fewer than one gram yields an empty set.
  *
  * @return array<struct<pos:int, hash:long>> of DISTINCT selections in
  *         increasing position order (positions are 0-based gram starts
  *         in the normalized string; the long carries md5-lower-64 bits,
  *         unsigned semantics). */
case class WinnowFingerprints(child: Expression, k: Int, w: Int)
  extends UnaryExpression with KernelUnaryCodegen {

  require(k >= 1, s"gram size must be >= 1: $k")
  require(w >= 1, s"window size must be >= 1: $w")

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("pos", IntegerType, nullable = false),
    StructField("hash", LongType, nullable = false))), containsNull = false)
  override def nullIntolerant: Boolean = true

  def compute(input: UTF8String): ArrayData = {
    val bytes = input.toLowerCase.getBytes
    val norm = new Array[Byte](bytes.length)
    var m = 0
    var i = 0
    var pendingSpace = false
    while (i < bytes.length) {
      val b = bytes(i)
      if ((b >= 'a' && b <= 'z') || (b >= '0' && b <= '9')) {
        if (pendingSpace && m > 0) { norm(m) = ' '; m += 1 }
        pendingSpace = false
        norm(m) = b
        m += 1
      } else pendingSpace = true
      i += 1
    }
    val grams = m - k + 1
    if (grams <= 0) return new GenericArrayData(Array.empty[Any])
    val hs = new Array[Long](grams)
    var p = 0
    while (p < grams) {
      hs(p) = Hashing.md5Lower64(UTF8String.fromBytes(
        java.util.Arrays.copyOfRange(norm, p, p + k)))
      p += 1
    }
    val windows = math.max(grams - w + 1, 1)
    // selected positions are non-decreasing as the window slides, so a
    // last-emitted check is a full distinct
    val pos = scala.collection.mutable.ArrayBuffer.empty[Int]
    var j = 0
    var last = -1
    while (j < windows) {
      val end = math.min(j + w, grams)
      var best = j
      var q = j + 1
      // rightmost minimum: strictly-greater keeps the earlier index, so
      // >= moves it right — unsigned compare matches DuckDB UBIGINT order
      while (q < end) {
        if (java.lang.Long.compareUnsigned(hs(q), hs(best)) <= 0) best = q
        q += 1
      }
      if (best != last) { pos += best; last = best }
      j += 1
    }
    val out = new Array[Any](pos.length)
    var t = 0
    while (t < pos.length) {
      out(t) = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any](pos(t), hs(pos(t))))
      t += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(input: Any): Any = compute(input.asInstanceOf[UTF8String])

  override protected def kernelCall(ref: String, c: String): String = s"$ref.compute($c)"

  override protected def withNewChildInternal(c: Expression): WinnowFingerprints = copy(child = c)
}

/** All blocklist phrases occurring as SUBSTRINGS of the text, in
  * phrase-list order — ONE Aho–Corasick pass (O(len + matches)) over a
  * plan-literal phrase set instead of N `contains` scans (O(N·len)):
  * the multi-phrase safety / blocklist gate at corpus scale, where the
  * banned-phrase list is thousands long and the text is the whole
  * corpus. Matching is raw case-sensitive substring semantics, exactly
  * `contains` — pre-lowercase input AND phrases for case-folded gates;
  * duplicate phrases collapse to their first occurrence. */
case class MatchedPhrases(child: Expression, phrases: Seq[String])
  extends UnaryExpression with KernelUnaryCodegen {

  require(phrases.nonEmpty, "at least one phrase required")
  require(phrases.forall(_.nonEmpty), "phrases must be non-empty")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true

  @transient private lazy val distinctPhrases: Array[String] =
    phrases.distinct.toArray

  // goto trie + BFS fail links + per-node matched phrase ids (outputs of
  // the fail chain merged in, so one state lookup yields every match)
  @transient private lazy val automaton: (Array[scala.collection.mutable.HashMap[Char, Int]], Array[Int], Array[List[Int]]) = {
    val children = scala.collection.mutable.ArrayBuffer(
      scala.collection.mutable.HashMap.empty[Char, Int])
    val outs = scala.collection.mutable.ArrayBuffer(List.empty[Int])
    distinctPhrases.zipWithIndex.foreach { case (p, pi) =>
      var s = 0
      p.foreach { c =>
        s = children(s).getOrElseUpdate(c, {
          children += scala.collection.mutable.HashMap.empty[Char, Int]
          outs += List.empty[Int]
          children.length - 1
        })
      }
      outs(s) = pi :: outs(s)
    }
    val fail = new Array[Int](children.length)
    val queue = scala.collection.mutable.Queue.empty[Int]
    children(0).valuesIterator.foreach { c => fail(c) = 0; queue += c }
    while (queue.nonEmpty) {
      val s = queue.dequeue()
      children(s).foreach { case (ch, t) =>
        var f = fail(s)
        while (f != 0 && !children(f).contains(ch)) f = fail(f)
        // f follows fail links from fail(s), always shallower than s, so
        // children(f)(ch) can never be t itself
        fail(t) = if (children(f).contains(ch)) children(f)(ch) else 0
        outs(t) = outs(t) ++ outs(fail(t))
        queue += t
      }
    }
    (children.toArray, fail, outs.toArray)
  }

  def compute(input: UTF8String): ArrayData = {
    val (children, fail, outs) = automaton
    val text = input.toString
    val matched = new java.util.BitSet(distinctPhrases.length)
    var s = 0
    var i = 0
    val n = text.length
    while (i < n) {
      val c = text.charAt(i)
      while (s != 0 && !children(s).contains(c)) s = fail(s)
      s = children(s).getOrElse(c, 0)
      var o = outs(s)
      while (o.nonEmpty) { matched.set(o.head); o = o.tail }
      i += 1
    }
    val hits = scala.collection.mutable.ArrayBuffer.empty[Any]
    var pi = 0
    while (pi < distinctPhrases.length) {
      if (matched.get(pi)) hits += UTF8String.fromString(distinctPhrases(pi))
      pi += 1
    }
    new GenericArrayData(hits.toArray)
  }

  override def nullSafeEval(input: Any): Any = compute(input.asInstanceOf[UTF8String])

  override protected def kernelCall(ref: String, c: String): String = s"$ref.compute($c)"

  override protected def withNewChildInternal(c: Expression): MatchedPhrases = copy(child = c)
}

/** Count of array elements contained in a fixed string set (codegen-free
  * replacement for `size(filter(tokens, t => array_contains(lits, t)))`,
  * whose lambda evaluates interpreted per token). */
case class CountInSet(child: Expression, words: Seq[String])
  extends UnaryExpression with KernelUnaryCodegen {

  @transient private lazy val set: java.util.HashSet[UTF8String] = {
    val s = new java.util.HashSet[UTF8String](words.size * 2)
    words.foreach(w => s.add(UTF8String.fromString(w)))
    s
  }

  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true

  def compute(arr: ArrayData): Int = {
    var count = 0
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      if (!arr.isNullAt(i) && set.contains(arr.getUTF8String(i))) count += 1
      i += 1
    }
    count
  }

  override def nullSafeEval(input: Any): Any = compute(input.asInstanceOf[ArrayData])

  override protected def kernelCall(ref: String, c: String): String = s"$ref.compute($c)"

  override protected def withNewChildInternal(c: Expression): CountInSet = copy(child = c)
}

/** Array minus a fixed string set, order and duplicates preserved — the
  * hash-set twin of [[CountInSet]] for boilerplate removal, replacing
  * `filter(arr, s => !array_contains(lits, s))`, which scans the literal
  * array per element (O(|arr| × |set|) interpreted). */
case class RemoveInSet(child: Expression, words: Seq[String])
  extends UnaryExpression with KernelUnaryCodegen {

  @transient private lazy val set: java.util.HashSet[UTF8String] = {
    val s = new java.util.HashSet[UTF8String](words.size * 2)
    words.foreach(w => s.add(UTF8String.fromString(w)))
    s
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true

  def compute(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    val out = new java.util.ArrayList[Any](n)
    var i = 0
    while (i < n) {
      val v = if (arr.isNullAt(i)) UTF8String.EMPTY_UTF8 else arr.getUTF8String(i)
      if (!set.contains(v)) out.add(v)
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  override def nullSafeEval(input: Any): Any = compute(input.asInstanceOf[ArrayData])

  override protected def kernelCall(ref: String, c: String): String = s"$ref.compute($c)"

  override protected def withNewChildInternal(c: Expression): RemoveInSet = copy(child = c)
}

/** k-word shingles of a token array: element i = tokens[i..i+k) joined by
  * a single space; fewer than k tokens collapse to one whole-text shingle. */
case class WordShingles(child: Expression, k: Int)
  extends UnaryExpression with KernelUnaryCodegen {

  private val space = UTF8String.fromString(" ")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true

  def compute(arr: ArrayData): ArrayData = {
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

  override def nullSafeEval(input: Any): Any = compute(input.asInstanceOf[ArrayData])

  override protected def kernelCall(ref: String, c: String): String = s"$ref.compute($c)"

  override protected def withNewChildInternal(c: Expression): WordShingles = copy(child = c)
}

/** Strided token windows: window w starts at token w*stride and covers
  * min(k, remaining) tokens joined by a single space; the last window
  * index is ceil(max(n-k, 0)/stride), so the tail may be partial but no
  * window is contained in an earlier one; an empty array yields no
  * windows. stride == k gives non-overlapping segments (boilerplate
  * dedup), stride < k overlapping chunks (context-window prep). */
case class WordWindows(child: Expression, k: Int, stride: Int)
  extends UnaryExpression with KernelUnaryCodegen {

  require(k >= 1, s"window size must be >= 1: $k")
  require(stride >= 1 && stride <= k, s"stride must be in [1, k]: $stride")

  private val space = UTF8String.fromString(" ")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true

  def compute(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    if (n == 0) return new GenericArrayData(Array.empty[Any])
    val toks = new Array[UTF8String](n)
    var i = 0
    while (i < n) {
      toks(i) = if (arr.isNullAt(i)) UTF8String.EMPTY_UTF8 else arr.getUTF8String(i)
      i += 1
    }
    val extra = math.max(n - k, 0)
    val nWin = (extra + stride - 1) / stride + 1
    val out = new Array[Any](nWin)
    var w = 0
    while (w < nWin) {
      val start = w * stride
      val len = math.min(k, n - start)
      val window = new Array[UTF8String](len)
      System.arraycopy(toks, start, window, 0, len)
      out(w) = UTF8String.concatWs(space, window: _*)
      w += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(input: Any): Any = compute(input.asInstanceOf[ArrayData])

  override protected def kernelCall(ref: String, c: String): String = s"$ref.compute($c)"

  override protected def withNewChildInternal(c: Expression): WordWindows = copy(child = c)
}

/** MinHash signature of a string array: sig(i) = min over elements of
  * (h1 + i*h2) — the standard universal-hash composition, one xxhash64
  * pair per element instead of numHashes full hashes. */
case class MinHashSignature(child: Expression, numHashes: Int)
  extends UnaryExpression with KernelUnaryCodegen {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true

  def compute(arr: ArrayData): ArrayData = {
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

  override def nullSafeEval(input: Any): Any = compute(input.asInstanceOf[ArrayData])

  override protected def kernelCall(ref: String, c: String): String = s"$ref.compute($c)"

  override protected def withNewChildInternal(c: Expression): MinHashSignature = copy(child = c)
}

/** 64-bit SimHash of a string array (token list): per element hash, each
  * bit votes ±1, fingerprint bit = sign of the vote sum.
  *
  * `algo` selects the token hash: "xx" (xxhash64, fastest — default) or
  * "md5" (lower 8 digest bytes, little-endian = DuckDB md5_number_lower,
  * so an external SQL engine can reproduce fingerprints exactly). */
case class SimHash64(child: Expression, algo: String = "xx")
  extends UnaryExpression with KernelUnaryCodegen {

  require(algo == "xx" || algo == "md5", s"unknown simhash token hash: $algo")

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  def compute(arr: ArrayData): Long = {
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
    fp
  }

  override def nullSafeEval(input: Any): Any = compute(input.asInstanceOf[ArrayData])

  override protected def kernelCall(ref: String, c: String): String = s"$ref.compute($c)"

  override protected def withNewChildInternal(c: Expression): SimHash64 = copy(child = c)
}

object SimHash64 {
  /** JVM-side helper for tests: simhash of a token seq. */
  def of(tokens: Seq[String], algo: String = "xx"): Long = {
    val arr = new GenericArrayData(tokens.map(UTF8String.fromString).toArray[Any])
    SimHash64(null, algo).compute(arr)
  }
}

/** md5-lower-64 of a string as a signed long whose BITS equal DuckDB's
  * `md5_number_lower` UBIGINT — the shared salt-hash primitive for
  * oracle-replayable randomness (Gumbel keys, bucket hashing). Callers
  * needing unsigned arithmetic must use unsigned operators
  * (shiftrightunsigned / remainderUnsigned) on the signed value. */
case class Md5Lower64(child: Expression)
  extends UnaryExpression with KernelUnaryCodegen {

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  def compute(s: UTF8String): Long = Hashing.md5Lower64(s)

  override def nullSafeEval(input: Any): Any = compute(input.asInstanceOf[UTF8String])

  override protected def kernelCall(ref: String, c: String): String = s"$ref.compute($c)"

  override protected def withNewChildInternal(c: Expression): Md5Lower64 = copy(child = c)
}

/** All DISTINCT strings reachable by deleting up to `d` code points
  * from the input, the original included — the symmetric-delete blocking
  * key set (SymSpell): if levenshtein(a, b) <= d then some variant is in
  * both neighborhoods (fix an optimal alignment; delete from `a` the
  * characters it substitutes or deletes, from `b` those it substitutes
  * or inserts — each side drops <= d characters and the remainders are
  * equal), so an equi-join on the exploded variants has EXACT recall
  * for edit distance <= d with no cross join. Neighborhood size is
  * O(C(len, d)) — intended for short attribute strings (names, titles,
  * codes); block document-scale text on q-grams/shingles instead.
  * BFS first-occurrence order; duplicate variants (e.g. deleting either
  * of two adjacent equal characters) emitted once. */
case class DeletionNeighborhood(child: Expression, d: Int)
  extends UnaryExpression with KernelUnaryCodegen {

  require(d >= 0 && d <= 3, s"deletion depth must be in [0, 3]: $d")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true

  def compute(input: UTF8String): ArrayData = {
    val s0 = input.toString
    val seen = new java.util.LinkedHashSet[String]()
    seen.add(s0)
    var frontier: List[String] = s0 :: Nil
    var depth = 0
    while (depth < d && frontier.nonEmpty) {
      val next = scala.collection.mutable.ListBuffer.empty[String]
      frontier.foreach { s =>
        var i = 0
        while (i < s.length) {
          // one code point per step (surrogate pairs stay intact)
          val step = Character.charCount(s.codePointAt(i))
          val v = s.substring(0, i) + s.substring(i + step)
          if (seen.add(v)) next += v
          i += step
        }
      }
      // descendants depend only on the string, so duplicate-path pruning
      // via `seen` loses nothing
      frontier = next.toList
      depth += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var j = 0
    while (it.hasNext) { out(j) = UTF8String.fromString(it.next()); j += 1 }
    new GenericArrayData(out)
  }

  override def nullSafeEval(input: Any): Any = compute(input.asInstanceOf[UTF8String])

  override protected def kernelCall(ref: String, c: String): String = s"$ref.compute($c)"

  override protected def withNewChildInternal(c: Expression): DeletionNeighborhood = copy(child = c)
}

/** Order-preserving double → long transform (the classic sortable-bits
  * trick): raw IEEE-754 bits with the lower 63 bits flipped for
  * negatives, so SIGNED long comparison of the outputs equals
  * `java.lang.Double.compare` of the inputs (−0.0 < 0.0, infinities at
  * the ends; NaN above +∞ — callers ranking distances/scores never see
  * one). The transform is an involution restricted to the sign-bit
  * classes, inverted exactly by [[DoubleFromSortableBits]] — together
  * they let the long-keyed [[TopKByKey]] heap rank DOUBLE keys with no
  * precision loss. */
case class SortableDoubleBits(child: Expression)
  extends UnaryExpression with KernelUnaryCodegen {

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  def compute(d: Double): Long = {
    val b = java.lang.Double.doubleToLongBits(d)
    b ^ ((b >> 63) & 0x7fffffffffffffffL)
  }

  override def nullSafeEval(input: Any): Any = compute(input.asInstanceOf[Double])

  override protected def kernelCall(ref: String, c: String): String = s"$ref.compute($c)"

  override protected def withNewChildInternal(c: Expression): SortableDoubleBits = copy(child = c)
}

/** Exact inverse of [[SortableDoubleBits]] — recovers the original
  * double bit-for-bit from its sortable long form. */
case class DoubleFromSortableBits(child: Expression)
  extends UnaryExpression with KernelUnaryCodegen {

  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true

  def compute(b: Long): Double =
    java.lang.Double.longBitsToDouble(b ^ ((b >> 63) & 0x7fffffffffffffffL))

  override def nullSafeEval(input: Any): Any = compute(input.asInstanceOf[Long])

  override protected def kernelCall(ref: String, c: String): String = s"$ref.compute($c)"

  override protected def withNewChildInternal(c: Expression): DoubleFromSortableBits = copy(child = c)
}

/** Bucket index of a double against a FIXED ascending boundary array:
  * the count of boundaries strictly below the value (binary search,
  * O(log B) per row, codegen'd). Monotone in the value and a PURE
  * function of it — equal values always share a bucket, and the bucket
  * order agrees with the value order — which is what lets
  * [[graft.ops.GlobalOrder]] recompute bucket membership across
  * independent jobs without caching: membership depends only on the
  * row, never on shuffle layout. A value equal to a boundary lands in
  * the LOWER bucket (strict <). */
case class BucketByBounds(child: Expression, bounds: Seq[Double])
  extends UnaryExpression with KernelUnaryCodegen {

  require(bounds.nonEmpty, "at least one boundary required")
  require(bounds.sliding(2).forall(p => p.length < 2 || p(0) <= p(1)),
    "boundaries must be ascending")

  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true

  @transient private lazy val arr: Array[Double] = bounds.toArray

  def compute(v: Double): Int = {
    var lo = 0
    var hi = arr.length
    while (lo < hi) {
      val m = (lo + hi) >>> 1
      if (arr(m) < v) lo = m + 1 else hi = m
    }
    lo
  }

  override def nullSafeEval(input: Any): Any = compute(input.asInstanceOf[Double])

  override protected def kernelCall(ref: String, c: String): String = s"$ref.compute($c)"

  override protected def withNewChildInternal(c: Expression): BucketByBounds = copy(child = c)
}

/** Feature-hashing bucket of a string: md5-lower-64 reduced modulo
  * `buckets` with UNSIGNED remainder semantics — bit-identical to DuckDB
  * `md5_number_lower(s) % buckets` (whose md5_number_lower is a UBIGINT),
  * so hashed-feature models (DSIR importance weights) are replicable by
  * an external SQL oracle. Codegen'd map-side kernel: hashing the token
  * stream of 100 TB is one scan, no shuffle. */
case class Md5Bucket(child: Expression, buckets: Int)
  extends UnaryExpression with KernelUnaryCodegen {

  require(buckets >= 1, s"buckets must be >= 1: $buckets")

  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true

  def compute(s: UTF8String): Int =
    java.lang.Long.remainderUnsigned(Hashing.md5Lower64(s), buckets.toLong).toInt

  override def nullSafeEval(input: Any): Any = compute(input.asInstanceOf[UTF8String])

  override protected def kernelCall(ref: String, c: String): String = s"$ref.compute($c)"

  override protected def withNewChildInternal(c: Expression): Md5Bucket = copy(child = c)
}

object Md5Bucket {
  /** JVM-side helper for tests. */
  def of(s: String, buckets: Int): Int =
    Md5Bucket(null, buckets).compute(UTF8String.fromString(s))
}

/** Sum over string-array elements of max(1, ceil(numChars / unit)) — the
  * BPE-ish subword estimate, one pass, no per-token lambda. */
case class SubwordCount(child: Expression, unit: Int)
  extends UnaryExpression with KernelUnaryCodegen {

  require(unit > 0, s"unit must be positive: $unit")

  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true

  def compute(arr: ArrayData): Int = {
    var total = 0
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val chars = arr.getUTF8String(i).numChars()
        val units = (chars + unit - 1) / unit
        total += math.max(1, units)
      }
      i += 1
    }
    total
  }

  override def nullSafeEval(input: Any): Any = compute(input.asInstanceOf[ArrayData])

  override protected def kernelCall(ref: String, c: String): String = s"$ref.compute($c)"

  override protected def withNewChildInternal(c: Expression): SubwordCount = copy(child = c)
}

/** Flattened byte-pair encoding of a token array under a fixed merge
  * list — the standard BPE inference loop (Sennrich et al. 2016,
  * arXiv:1508.07909 §3): each token splits to code-point symbols, then
  * the adjacent pair with the LOWEST merge rank fuses (all occurrences,
  * left-to-right) until no adjacent pair has a rank; the per-token
  * subword runs concatenate in order. Merge ranks ride the serialized
  * expression to every task; a per-task memo caches word → subwords so
  * a Zipf-distributed corpus pays the merge loop once per DISTINCT word
  * per task, not once per occurrence. */
case class BpeEncode(child: Expression, merges: Seq[(String, String)])
  extends UnaryExpression with KernelUnaryCodegen {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true

  // first occurrence of a duplicated pair keeps the lower (stronger) rank
  @transient private lazy val ranks: java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer](merges.size * 2)
    merges.zipWithIndex.foreach { case ((a, b), i) =>
      m.putIfAbsent(a + "\u0000" + b, Integer.valueOf(i))
    }
    m
  }
  @transient private lazy val memo =
    new java.util.HashMap[UTF8String, Array[UTF8String]]()
  private val MemoCap = 1 << 16

  private def encodeWord(word: String): Array[UTF8String] = {
    var syms: Array[String] =
      word.codePoints().toArray.map(cp => new String(Character.toChars(cp)))
    var done = syms.length <= 1
    while (!done) {
      var best = Int.MaxValue
      var i = 0
      while (i < syms.length - 1) {
        val r = ranks.get(syms(i) + "\u0000" + syms(i + 1))
        if (r != null && r.intValue() < best) best = r.intValue()
        i += 1
      }
      if (best == Int.MaxValue) done = true
      else {
        val (a, b) = merges(best)
        val out = new scala.collection.mutable.ArrayBuffer[String](syms.length)
        i = 0
        while (i < syms.length) {
          if (i < syms.length - 1 && syms(i) == a && syms(i + 1) == b) {
            out += a + b
            i += 2
          } else {
            out += syms(i)
            i += 1
          }
        }
        syms = out.toArray
        done = syms.length <= 1
      }
    }
    syms.map(UTF8String.fromString)
  }

  def compute(arr: ArrayData): ArrayData = {
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val w = arr.getUTF8String(i)
        var enc = memo.get(w)
        if (enc == null) {
          enc = encodeWord(w.toString)
          // cloned key: getUTF8String may return a view into reused buffers
          if (memo.size < MemoCap) memo.put(w.clone(), enc)
        }
        out ++= enc
      }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  override def nullSafeEval(input: Any): Any = compute(input.asInstanceOf[ArrayData])

  override protected def kernelCall(ref: String, c: String): String = s"$ref.compute($c)"

  override protected def withNewChildInternal(c: Expression): BpeEncode = copy(child = c)
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

/** One logistic-regression gradient pass per document — the codegen'd
  * replacement for [[graft.text.LogReg]]'s per-iteration HOF pair
  * (`aggregate` margin + `transform` gradient rows), whose lambdas
  * evaluate INTERPRETED per feature occurrence. Arithmetic is
  * bit-identical to the Column formulation it replaces:
  * margin = Σ tf·w(bucket) + intercept (exact long adds, wrap-safe
  * commutative), residual r = floor((y − σ(margin/10⁶))·10⁶ + 0.5) as
  * long (same Math.exp / floor / truncating cast), output rows =
  * per-feature (bucket, tf·r) in array order plus the (-1, r) intercept
  * sentinel. Weights live on the expression OBJECT (addReferenceObj),
  * not in generated source, so every GD iteration reuses one compiled
  * codegen class instead of recompiling a 1024-literal plan. */
case class LogRegGradient(
    feats: Expression, y: Expression,
    weightsMicro: Seq[Long], interceptMicro: Long)
  extends BinaryExpression with ExpectsInputTypes {

  override def left: Expression = feats
  override def right: Expression = y

  // analysis-time typing: a caller passing an int y or a differently
  // shaped feature array gets an AnalysisException, not a runtime
  // ClassCastException out of nullSafeEval/compute
  override def inputTypes = Seq(
    ArrayType(StructType(Seq(
      StructField("bucket", IntegerType),
      StructField("tf", LongType)))): DataType,
    LongType)

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("bucket", IntegerType, nullable = false),
    StructField("g", LongType, nullable = false))), containsNull = false)
  override def nullIntolerant: Boolean = true

  @transient private lazy val w: Array[Long] = weightsMicro.toArray

  def compute(arr: ArrayData, yv: Long): ArrayData = {
    val n = arr.numElements()
    var m = interceptMicro
    var i = 0
    while (i < n) {
      val row = arr.getStruct(i, 2)
      val b = row.getInt(0)
      if (b < 0 || b >= w.length) throw new IllegalArgumentException(
        s"feature bucket $b outside the model's ${w.length} weights — " +
          "features must be hashed with the numBuckets the model was fit with")
      m += row.getLong(1) * w(b)
      i += 1
    }
    val r = math.floor((yv.toDouble -
      1.0 / (1.0 + math.exp(-(m.toDouble / 1e6)))) * 1e6 + 0.5).toLong
    val out = new Array[Any](n + 1)
    i = 0
    while (i < n) {
      val row = arr.getStruct(i, 2)
      out(i) = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any](row.getInt(0), row.getLong(1) * r))
      i += 1
    }
    out(n) = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](-1, r))
    new GenericArrayData(out)
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    compute(a.asInstanceOf[ArrayData], b.asInstanceOf[java.lang.Long].longValue())

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftKernel", this, classOf[LogRegGradient].getName)
    defineCodeGen(ctx, ev, (a, b) => s"$ref.compute($a, $b)")
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): LogRegGradient =
    copy(feats = l, y = r)
}

/** Count of positions where two equal-length long arrays agree — the
  * compiled twin of `aggregate(zip_with(a, b, (x,y) => if(x=y) 1 else 0),
  * 0, +)` for MinHash signature comparison, whose HOF lambdas evaluate
  * interpreted per signature position. Integer-exact, so the downstream
  * ratio is bit-identical. */
case class ArrayAgreeCount(left: Expression, right: Expression)
  extends BinaryExpression with ExpectsInputTypes {

  // long arrays only: positional getLong on any other element width would
  // read garbage — reject at analysis time
  override def inputTypes =
    Seq(ArrayType(LongType): DataType, ArrayType(LongType))

  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true

  def compute(x: ArrayData, y: ArrayData): Int = {
    val n = math.min(x.numElements(), y.numElements())
    var c = 0
    var i = 0
    while (i < n) {
      if (x.getLong(i) == y.getLong(i)) c += 1
      i += 1
    }
    c
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftKernel", this, classOf[ArrayAgreeCount].getName)
    defineCodeGen(ctx, ev, (a, b) => s"$ref.compute($a, $b)")
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): ArrayAgreeCount =
    copy(left = l, right = r)
}

/** Dot product of two numeric arrays in double precision, accumulating
  * left-to-right (bit-identical to the zip_with/aggregate formulation and
  * to a sequential SQL list_sum). */
case class DotProduct(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true

  @transient private lazy val etx = VecOps.elemType(left)
  @transient private lazy val ety = VecOps.elemType(right)

  def compute(x: ArrayData, y: ArrayData): Double = {
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += VecOps.get(x, etx, i) * VecOps.get(y, ety, i)
      i += 1
    }
    acc
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftKernel", this, classOf[DotProduct].getName)
    defineCodeGen(ctx, ev, (a, b) => s"$ref.compute($a, $b)")
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): DotProduct =
    copy(left = l, right = r)
}

/** Sum of squares (squared L2 norm) of a numeric array, left-to-right. */
case class NormSquared(child: Expression)
  extends UnaryExpression with KernelUnaryCodegen {

  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true

  @transient private lazy val et = VecOps.elemType(child)

  def compute(x: ArrayData): Double = {
    var acc = 0.0
    var i = 0
    val n = x.numElements()
    while (i < n) {
      val v = VecOps.get(x, et, i)
      acc += v * v
      i += 1
    }
    acc
  }

  override def nullSafeEval(input: Any): Any = compute(input.asInstanceOf[ArrayData])

  override protected def kernelCall(ref: String, c: String): String = s"$ref.compute($c)"

  override protected def withNewChildInternal(c: Expression): NormSquared = copy(child = c)
}

/** Milli-quantization of a numeric array: floor(x·1000 + 0.5) per
  * element as double — the codegen'd twin of
  * `transform(v, x => floor(x.cast("double") * 1000.0 + 0.5))`, whose
  * lambda evaluates interpreted per element. float→double is exact, and
  * `Math.floor` on doubles is the same IEEE op the HOF evaluates, so
  * outputs are bit-identical. */
case class QuantizeMilli(child: Expression)
  extends UnaryExpression with KernelUnaryCodegen {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullIntolerant: Boolean = true

  @transient private lazy val et = VecOps.elemType(child)

  def compute(x: ArrayData): ArrayData = {
    val n = x.numElements()
    val out = new Array[Double](n)
    var i = 0
    while (i < n) {
      out(i) = math.floor(VecOps.get(x, et, i) * 1000.0 + 0.5)
      i += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(input: Any): Any = compute(input.asInstanceOf[ArrayData])

  override protected def kernelCall(ref: String, c: String): String = s"$ref.compute($c)"

  override protected def withNewChildInternal(c: Expression): QuantizeMilli = copy(child = c)
}

/** Nearest centroid (squared L2, FIRST-min ties) of a numeric array
  * against a fixed centroid matrix, plus the winning distance — the
  * codegen'd replacement for
  * `transform(centsLit, c => aggregate(zip_with(v, c, …), 0.0, _+_))` +
  * `array_position(dists, array_min(dists))`, whose lambdas evaluate
  * interpreted per (centroid × dimension) and dominate the k-means /
  * PQ-training scan time. Arithmetic is bit-identical to the HOF
  * formulation: per centroid the per-dimension squares accumulate
  * left-to-right from 0.0, and strict `<` keeps the first minimum —
  * asserted against the HOF path in PipelineSpec. A vector whose
  * dimension differs from the centroids' fails fast — the HOF
  * formulation surfaced a mismatch as nulls; silently truncating the
  * distance loop would instead produce wrong assignments. */
case class NearestCentroid(child: Expression, centroids: Seq[Seq[Double]])
  extends UnaryExpression with KernelUnaryCodegen {

  require(centroids.nonEmpty, "at least one centroid required")
  require(centroids.forall(_.length == centroids.head.length),
    "all centroids must share a dimension")

  override def dataType: DataType = StructType(Seq(
    StructField("idx", IntegerType, nullable = false),
    StructField("dist", DoubleType, nullable = false)))
  override def nullIntolerant: Boolean = true

  @transient private lazy val et = VecOps.elemType(child)
  @transient private lazy val cents: Array[Array[Double]] =
    centroids.map(_.toArray).toArray

  def compute(x: ArrayData): org.apache.spark.sql.catalyst.InternalRow = {
    val k = cents.length
    if (x.numElements() != cents(0).length) {
      throw new IllegalArgumentException(
        s"nearest_centroid: vector dimension ${x.numElements()} does not " +
          s"match centroid dimension ${cents(0).length}")
    }
    var best = 0
    var bestD = Double.PositiveInfinity
    var c = 0
    while (c < k) {
      val cent = cents(c)
      val n = cent.length
      var acc = 0.0
      var i = 0
      while (i < n) {
        val d = VecOps.get(x, et, i) - cent(i)
        acc += d * d
        i += 1
      }
      if (acc < bestD) { bestD = acc; best = c }
      c += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](best, bestD))
  }

  override def nullSafeEval(input: Any): Any = compute(input.asInstanceOf[ArrayData])

  override protected def kernelCall(ref: String, c: String): String = s"$ref.compute($c)"

  override protected def withNewChildInternal(c: Expression): NearestCentroid = copy(child = c)
}

/** Indices of the `n` nearest centroids ordered by (squared L2 asc,
  * index asc) — the multi-probe sibling of [[NearestCentroid]] (whose
  * element 0 it reproduces by the same strict-< first-min tie rule).
  * Same exact arithmetic and same fail-fast dimension guard. */
case class NearestCentroids(child: Expression, centroids: Seq[Seq[Double]], n: Int)
  extends UnaryExpression with KernelUnaryCodegen {

  require(centroids.nonEmpty, "at least one centroid required")
  require(centroids.forall(_.length == centroids.head.length),
    "all centroids must share a dimension")
  require(n >= 1 && n <= centroids.length,
    s"n must be in [1, ${centroids.length}]: $n")

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullIntolerant: Boolean = true

  @transient private lazy val et = VecOps.elemType(child)
  @transient private lazy val cents: Array[Array[Double]] =
    centroids.map(_.toArray).toArray

  def compute(x: ArrayData): ArrayData = {
    val k = cents.length
    if (x.numElements() != cents(0).length) {
      throw new IllegalArgumentException(
        s"nearest_centroids: vector dimension ${x.numElements()} does not " +
          s"match centroid dimension ${cents(0).length}")
    }
    val keptIdx = new Array[Int](n)
    val keptDist = new Array[Double](n)
    var kept = 0
    var c = 0
    while (c < k) {
      val cent = cents(c)
      val dim = cent.length
      var acc = 0.0
      var i = 0
      while (i < dim) {
        val d = VecOps.get(x, et, i) - cent(i)
        acc += d * d
        i += 1
      }
      // insert at the first kept position with a STRICTLY larger dist:
      // equal distances keep the earlier index first (idx-asc ties, the
      // NearestCentroid rule)
      if (kept < n || acc < keptDist(kept - 1)) {
        var p = kept
        while (p > 0 && keptDist(p - 1) > acc) p -= 1
        val last = math.min(kept, n - 1)
        var j = last
        while (j > p) { keptIdx(j) = keptIdx(j - 1); keptDist(j) = keptDist(j - 1); j -= 1 }
        keptIdx(p) = c
        keptDist(p) = acc
        if (kept < n) kept += 1
      }
      c += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      keptIdx.map(i => i: Any))
  }

  override def nullSafeEval(input: Any): Any = compute(input.asInstanceOf[ArrayData])

  override protected def kernelCall(ref: String, c: String): String = s"$ref.compute($c)"

  override protected def withNewChildInternal(c: Expression): NearestCentroids = copy(child = c)
}

/** Dense matrix–vector product against a fixed plan-literal matrix:
  * out(j) = Σ_i mat(j)(i)·x(i), per-row sums accumulating left-to-right
  * from 0.0 — the codegen'd kernel behind seeded random projection
  * (Johnson–Lindenstrauss dimensionality reduction before clustering /
  * ANN at scale). With milli-quantized integer-valued inputs and a ±1
  * Rademacher matrix every output is an exact integer, so an external
  * SQL oracle replays the projection bit-for-bit. Same fail-fast
  * dimension guard as [[NearestCentroid]]. */
case class MatVec(child: Expression, mat: Seq[Seq[Double]])
  extends UnaryExpression with KernelUnaryCodegen {

  require(mat.nonEmpty, "matrix must have at least one row")
  require(mat.forall(_.length == mat.head.length),
    "all matrix rows must share a length")

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullIntolerant: Boolean = true

  @transient private lazy val et = VecOps.elemType(child)
  @transient private lazy val m: Array[Array[Double]] = mat.map(_.toArray).toArray

  def compute(x: ArrayData): ArrayData = {
    if (x.numElements() != m(0).length) {
      throw new IllegalArgumentException(
        s"mat_vec: vector dimension ${x.numElements()} does not match " +
          s"matrix column count ${m(0).length}")
    }
    val out = new Array[Double](m.length)
    var j = 0
    while (j < m.length) {
      val row = m(j)
      var acc = 0.0
      var i = 0
      while (i < row.length) {
        acc += row(i) * VecOps.get(x, et, i)
        i += 1
      }
      out(j) = acc
      j += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(input: Any): Any = compute(input.asInstanceOf[ArrayData])

  override protected def kernelCall(ref: String, c: String): String = s"$ref.compute($c)"

  override protected def withNewChildInternal(c: Expression): MatVec = copy(child = c)
}

/** Column-level wrappers. */
/** Bloom-filter membership probe against a BROADCAST filter — the
  * row-level half of runtime join pruning ([[graft.index.JoinPrune]]
  * `bloomJoinPruned`). Spark's own `BloomFilterMightContain` carries the
  * serialized filter as a plan literal; at a few MB per filter that
  * bloats plan serialization per task, so this probe rides the broadcast
  * torrent instead (the [[RemoveInSet]]-vs-broadcast-lexicon trade,
  * applied to blooms). No false negatives, so filtering an inner-join
  * probe side with it never changes the join result.
  *
  * Key encoding must match the build side exactly: integral types hash
  * via `putLong`/`mightContainLong` widening, strings via UTF-8 bytes
  * (`putBinary`/`mightContainBinary`). */
case class InBloom(
    child: Expression,
    bloom: org.apache.spark.broadcast.Broadcast[org.apache.spark.util.sketch.BloomFilter])
  extends UnaryExpression with KernelUnaryCodegen {

  override def dataType: DataType = BooleanType
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ByteType | ShortType | IntegerType | LongType | StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"in_bloom supports integral and string keys, got $other")
    }

  def computeLong(v: Long): Boolean = bloom.value.mightContainLong(v)
  def computeString(v: UTF8String): Boolean = bloom.value.mightContainBinary(v.getBytes)

  override def nullSafeEval(input: Any): Any = input match {
    case s: UTF8String => computeString(s)
    case b: Byte => computeLong(b.toLong)
    case s: Short => computeLong(s.toLong)
    case i: Int => computeLong(i.toLong)
    case l: Long => computeLong(l)
  }

  override protected def kernelCall(ref: String, c: String): String =
    child.dataType match {
      case StringType => s"$ref.computeString($c)"
      case _ => s"$ref.computeLong((long) $c)"
    }

  override protected def withNewChildInternal(c: Expression): InBloom = copy(child = c)
}

/** Hadoop-Path normalization of a path/URI string — scheme + authority
  * stripped, path component normalized — as a codegen'd kernel, so the
  * index build/refresh frames that key sketch rows by file stay inside
  * whole-stage codegen instead of paying a Scala-UDF boundary. MUST stay
  * semantically identical to [[graft.index.SketchStore.normalizePath]]
  * (it calls it): the driver-side key maps use that function directly,
  * and the two sides join on these strings. */
case class NormalizePath(child: Expression)
  extends UnaryExpression with KernelUnaryCodegen {

  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"normalize_path takes a string, got $other")
    }

  def compute(s: UTF8String): UTF8String =
    UTF8String.fromString(graft.index.SketchStore.normalizePath(s.toString))

  override def nullSafeEval(input: Any): Any = compute(input.asInstanceOf[UTF8String])

  override protected def kernelCall(ref: String, c: String): String =
    s"$ref.compute($c)"

  override protected def withNewChildInternal(c: Expression): NormalizePath =
    copy(child = c)
}

/** [[RemoveInSet]]'s BROADCAST tier: same per-element hash-set removal,
  * but the lexicon rides a broadcast variable instead of the serialized
  * plan — the over-`inlineThreshold` arm of `dedupSegments`, previously a
  * Scala UDF (a codegen boundary on the hottest per-document path). */
case class RemoveInBroadcastSet(
    child: Expression,
    set: org.apache.spark.broadcast.Broadcast[Set[String]])
  extends UnaryExpression with KernelUnaryCodegen {

  override def dataType: DataType = child.dataType
  override def nullIntolerant: Boolean = true

  def compute(arr: ArrayData): ArrayData = {
    val s = set.value
    val n = arr.numElements()
    val out = new java.util.ArrayList[Any](n)
    var i = 0
    while (i < n) {
      val v = if (arr.isNullAt(i)) null else arr.getUTF8String(i)
      if (v == null || !s.contains(v.toString)) out.add(v)
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  override def nullSafeEval(input: Any): Any = compute(input.asInstanceOf[ArrayData])
  override protected def kernelCall(ref: String, c: String): String = s"$ref.compute($c)"
  override protected def withNewChildInternal(c: Expression): RemoveInBroadcastSet =
    copy(child = c)
}

/** [[CountInSet]]'s BROADCAST tier (the decontamination probe past the
  * inline-literal threshold) — count of array elements present in the
  * broadcast set, codegen'd. Null input yields null (callers coalesce to
  * 0, preserving the former UDF's null-in-zero-out behavior). */
case class CountInBroadcastSet(
    child: Expression,
    set: org.apache.spark.broadcast.Broadcast[Set[String]])
  extends UnaryExpression with KernelUnaryCodegen {

  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true

  def compute(arr: ArrayData): Int = {
    val s = set.value
    val n = arr.numElements()
    var c = 0
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i) && s.contains(arr.getUTF8String(i).toString)) c += 1
      i += 1
    }
    c
  }

  override def nullSafeEval(input: Any): Any = compute(input.asInstanceOf[ArrayData])
  override protected def kernelCall(ref: String, c: String): String = s"$ref.compute($c)"
  override protected def withNewChildInternal(c: Expression): CountInBroadcastSet =
    copy(child = c)
}

/** Bloom-probe count over a string array — how many elements MIGHT be in
  * the broadcast filter ([[graft.text.Decontaminate.decontaminateBloom]]'s
  * map-side probe, previously a Scala UDF over every corpus document).
  * Same broadcast-over-plan-literal trade as [[InBloom]]. */
case class CountInBloom(
    child: Expression,
    bloom: org.apache.spark.broadcast.Broadcast[org.apache.spark.util.sketch.BloomFilter])
  extends UnaryExpression with KernelUnaryCodegen {

  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true

  def compute(arr: ArrayData): Int = {
    val bf = bloom.value
    val n = arr.numElements()
    var c = 0
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i) && bf.mightContainString(arr.getUTF8String(i).toString)) c += 1
      i += 1
    }
    c
  }

  override def nullSafeEval(input: Any): Any = compute(input.asInstanceOf[ArrayData])
  override protected def kernelCall(ref: String, c: String): String = s"$ref.compute($c)"
  override protected def withNewChildInternal(c: Expression): CountInBloom =
    copy(child = c)
}

/** Executor-side Hive `k=v` partition parse for the distributed refresh
  * listing — [[graft.index.IndexMetadata.parsePartitionPath]] as a
  * codegen'd kernel over the listed path column (the last non-UDF holdout
  * of the refresh path). Field types travel as DataType JSON and parse
  * once per executor; a layout drift inside throws, failing the listing
  * job loudly with the rebuild hint. */
case class ParsePartitionValues(child: Expression, root: String,
    fieldNames: Seq[String], fieldTypesJson: Seq[String])
  extends UnaryExpression with KernelUnaryCodegen {

  override def dataType: DataType = ArrayType(StringType, containsNull = true)
  override def nullIntolerant: Boolean = true

  @transient private lazy val fieldTypes =
    fieldTypesJson.map(org.apache.spark.sql.types.DataType.fromJson)

  def compute(p: UTF8String): ArrayData = {
    val vals = graft.index.IndexMetadata.parsePartitionPath(
      p.toString, root, fieldNames, fieldTypes)
    new GenericArrayData(vals.map(v =>
      if (v == null) null else UTF8String.fromString(v)))
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  override protected def kernelCall(ref: String, c: String): String =
    s"$ref.compute($c)"

  override protected def withNewChildInternal(c: Expression): ParsePartitionValues =
    copy(child = c)
}

object exprs {
  def tokenize(text: Column): Column =
    SparkInternals.wrap(Tokenize(SparkInternals.unwrap(text)))
  def count_in_set(tokens: Column, words: Seq[String]): Column =
    SparkInternals.wrap(CountInSet(SparkInternals.unwrap(tokens), words))
  def remove_in_set(tokens: Column, words: Seq[String]): Column =
    SparkInternals.wrap(RemoveInSet(SparkInternals.unwrap(tokens), words))
  def char_ngrams(text: Column, n: Int): Column =
    SparkInternals.wrap(CharNgrams(SparkInternals.unwrap(text), n))
  /** [[NormalizePath]] as a Column (the executor-side twin of
    * SketchStore.normalizePath). */
  def normalize_path(c: Column): Column =
    SparkInternals.wrap(NormalizePath(SparkInternals.unwrap(c)))
  def remove_in_broadcast_set(tokens: Column,
      set: org.apache.spark.broadcast.Broadcast[Set[String]]): Column =
    SparkInternals.wrap(RemoveInBroadcastSet(SparkInternals.unwrap(tokens), set))
  def count_in_broadcast_set(tokens: Column,
      set: org.apache.spark.broadcast.Broadcast[Set[String]]): Column =
    SparkInternals.wrap(CountInBroadcastSet(SparkInternals.unwrap(tokens), set))
  def count_in_bloom(tokens: Column,
      bloom: org.apache.spark.broadcast.Broadcast[org.apache.spark.util.sketch.BloomFilter])
      : Column =
    SparkInternals.wrap(CountInBloom(SparkInternals.unwrap(tokens), bloom))
  /** [[ParsePartitionValues]] as a Column. */
  def parse_partition_values(c: Column, root: String,
      fieldNames: Seq[String], fieldTypesJson: Seq[String]): Column =
    SparkInternals.wrap(ParsePartitionValues(
      SparkInternals.unwrap(c), root, fieldNames, fieldTypesJson))
  /** MOSS winnowing: distinct (pos, md5-lower-64) fingerprint selections. */
  def winnow_fingerprints(text: Column, k: Int, w: Int): Column =
    SparkInternals.wrap(WinnowFingerprints(SparkInternals.unwrap(text), k, w))
  /** Aho–Corasick: blocklist phrases contained in the text, list order. */
  def matched_phrases(text: Column, phrases: Seq[String]): Column =
    SparkInternals.wrap(MatchedPhrases(SparkInternals.unwrap(text), phrases))
  def word_shingles(tokens: Column, k: Int): Column =
    SparkInternals.wrap(WordShingles(SparkInternals.unwrap(tokens), k))
  def word_windows(tokens: Column, k: Int, stride: Int): Column =
    SparkInternals.wrap(WordWindows(SparkInternals.unwrap(tokens), k, stride))
  def minhash_signature(tokens: Column, numHashes: Int): Column =
    SparkInternals.wrap(MinHashSignature(SparkInternals.unwrap(tokens), numHashes))
  def subword_count(tokens: Column, unit: Int): Column =
    SparkInternals.wrap(SubwordCount(SparkInternals.unwrap(tokens), unit))
  def bpe_encode(tokens: Column, merges: Seq[(String, String)]): Column =
    SparkInternals.wrap(BpeEncode(SparkInternals.unwrap(tokens), merges))
  def simhash64(tokens: Column, algo: String = "xx"): Column =
    SparkInternals.wrap(SimHash64(SparkInternals.unwrap(tokens), algo))
  def md5_bucket(s: Column, buckets: Int): Column =
    SparkInternals.wrap(Md5Bucket(SparkInternals.unwrap(s), buckets))
  def md5_lower64(s: Column): Column =
    SparkInternals.wrap(Md5Lower64(SparkInternals.unwrap(s)))
  /** symmetric-delete blocking keys: all <= d-deletion variants. */
  def deletion_neighborhood(s: Column, d: Int): Column =
    SparkInternals.wrap(DeletionNeighborhood(SparkInternals.unwrap(s), d))
  /** per-document LogReg gradient rows (incl. the -1 intercept sentinel). */
  def logreg_gradient(feats: Column, y: Column,
      weightsMicro: Seq[Long], interceptMicro: Long): Column =
    SparkInternals.wrap(LogRegGradient(SparkInternals.unwrap(feats),
      SparkInternals.unwrap(y), weightsMicro, interceptMicro))
  /** count of agreeing positions of two equal-length long arrays. */
  def array_agree_count(a: Column, b: Column): Column =
    SparkInternals.wrap(ArrayAgreeCount(
      SparkInternals.unwrap(a), SparkInternals.unwrap(b)))
  def dot_product(a: Column, b: Column): Column =
    SparkInternals.wrap(DotProduct(SparkInternals.unwrap(a), SparkInternals.unwrap(b)))
  def norm_squared(a: Column): Column =
    SparkInternals.wrap(NormSquared(SparkInternals.unwrap(a)))
  def quantize_milli(a: Column): Column =
    SparkInternals.wrap(QuantizeMilli(SparkInternals.unwrap(a)))
  /** struct(idx, dist) of the nearest centroid (squared L2, first-min). */
  def nearest_centroid(a: Column, centroids: Seq[Seq[Double]]): Column =
    SparkInternals.wrap(NearestCentroid(SparkInternals.unwrap(a), centroids))
  /** indices of the n nearest centroids, (squared-L2 asc, index asc). */
  def nearest_centroids(a: Column, centroids: Seq[Seq[Double]], n: Int): Column =
    SparkInternals.wrap(NearestCentroids(SparkInternals.unwrap(a), centroids, n))
  /** out(j) = Σ_i mat(j)(i)·a(i) against a plan-literal matrix. */
  def mat_vec(a: Column, mat: Seq[Seq[Double]]): Column =
    SparkInternals.wrap(MatVec(SparkInternals.unwrap(a), mat))
  /** bounded-heap per-group top-k: array<struct<key,id>>, (key desc, id asc). */
  def top_k_by(key: Column, id: Column, k: Int): Column =
    SparkInternals.wrap(TopKByKey(
      SparkInternals.unwrap(key), SparkInternals.unwrap(id), k)
      .toAggregateExpression())
  /** order-preserving double→long (signed compare == Double.compare). */
  def sortable_double_bits(d: Column): Column =
    SparkInternals.wrap(SortableDoubleBits(SparkInternals.unwrap(d)))
  /** exact inverse of [[sortable_double_bits]]. */
  def double_from_sortable_bits(b: Column): Column =
    SparkInternals.wrap(DoubleFromSortableBits(SparkInternals.unwrap(b)))
  /** count of ascending literal boundaries strictly below the value. */
  def bucket_by_bounds(v: Column, bounds: Seq[Double]): Column =
    SparkInternals.wrap(BucketByBounds(SparkInternals.unwrap(v), bounds))
}
