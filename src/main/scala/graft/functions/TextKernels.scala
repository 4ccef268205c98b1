package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Per-document text kernels that collapse whole aggregation subplans into
  * single-pass projections. */
object TextKernels {

  /** Above this many chars a row routes to the offset-sort fallback: the
    * hash-map path costs ~80 B of untracked task heap per DISTINCT gram
    * (map node + boxed count + UTF8String slice), so a pathological
    * multi-hundred-MB document would allocate tens of GB; the sort path
    * is exact too and linear-small (~8 B/char). 8M chars ≈ 640 MB map
    * worst-case — every real document stays on the fast path. */
  val RepetitionMapMaxChars: Int = 8000000

  /** Char index → byte offset table (nChars+1 entries, last = nBytes) —
    * the shared builder behind every kernel that hashes/compares char
    * shingles in place (repetitionPpmSorted, MinHashKernels.minhashSig,
    * WinnowKernels.winnowFps): each shingle's bytes are then addressed
    * directly instead of substringSQL's walk-from-zero (O(n²) in doc
    * length). */
  def charOffsets(text: UTF8String): Array[Int] = {
    val base = text.getBaseObject
    val off = text.getBaseOffset
    val nBytes = text.numBytes()
    val nChars = text.numChars()
    val charOff = new Array[Int](nChars + 1)
    var ci = 0
    var bi = 0
    while (bi < nBytes) {
      charOff(ci) = bi
      bi += UTF8String.numBytesForFirstByte(
        org.apache.spark.unsafe.Platform.getByte(base, off + bi))
      ci += 1
    }
    charOff(nChars) = nBytes
    charOff
  }

  /** Repetition ratio: occurrences of the most repeated k-char shingle
    * over all shingle occurrences, floor-scaled to ppm. Replaces an
    * explode + two shuffled hash aggregates with one per-row pass — the
    * result is identical (counts per gram → max; total = shingle count)
    * and the two corpus-wide shuffles disappear from the plan.
    *
    * Heap bound holds BY CONSTRUCTION: rows longer than `maxMapChars`
    * fall back to [[repetitionPpmSorted]] (identical result, ~8 B/char),
    * so no document can blow the task heap through the gram map. The
    * explode-shaped `TextAnalysis.repetitionPpmDistributed` remains for
    * corpora where even 8×(text size) per row is too much. */
  def repetitionPpm(text: UTF8String, k: Int, maxMapChars: Int): Long = {
    val nChars = text.numChars()
    if (nChars > maxMapChars) return repetitionPpmSorted(text, k)
    if (k <= 8 && text.numBytes() == nChars) return repetitionPpmAsciiPacked(text, k)
    val n = math.max(nChars - k + 1, 1)
    val counts = new java.util.HashMap[UTF8String, Integer]()
    // direct byte addressing via charOffsets (see minShingleMd5's note)
    val bytes = text.getBytes
    val charOff = charOffsets(text)
    var maxC = 0
    var i = 0
    while (i < n) {
      val s = UTF8String.fromBytes(bytes, charOff(i),
        charOff(math.min(i + k, nChars)) - charOff(i))
      val prev = counts.get(s)
      val c = if (prev == null) 1 else prev + 1
      counts.put(s, c)
      if (c > maxC) maxC = c
      i += 1
    }
    maxC.toLong * 1000000L / n
  }

  /** ASCII fast path for [[repetitionPpm]]: 1 byte = 1 char and k <= 8
    * let every gram pack INJECTIVELY into a long (base-256, fixed width),
    * so counting runs a rolling-window key against an open-addressed
    * primitive table — no UTF8String slices, no boxing, no per-gram
    * allocation (the boxed-HashMap generic path measured ~0.3 ms per
    * 500-char doc; this is ~5x cheaper). Identical result by
    * construction: byte grams == char grams for pure ASCII, and packing
    * is injective at fixed k. ~24 B/char table bound, still governed by
    * the caller's maxMapChars guard. */
  private def repetitionPpmAsciiPacked(text: UTF8String, k: Int): Long = {
    val base = text.getBaseObject
    val off = text.getBaseOffset
    val nBytes = text.numBytes()
    if (nBytes < k) return 1000000L // one short gram: the whole text, once
    val n = nBytes - k + 1
    // the table needs 2n slots as an Int power of two; beyond 2^29 grams
    // (half a GiB of text — far past every maxMapChars default) route to
    // the sorted path instead of risking `n * 2` Int overflow collapsing
    // the capacity and turning the probe loop infinite on a full table
    if (n > (1 << 29)) return repetitionPpmSorted(text, k)
    val mask = if (k == 8) -1L else (1L << (8 * k)) - 1L
    var cap = java.lang.Integer.highestOneBit(math.max(n * 2, 16))
    if (cap < n * 2) cap <<= 1
    val keys = new Array[Long](cap)
    val cnts = new Array[Int](cap)
    java.util.Arrays.fill(keys, -1L) // ASCII keys are >= 0: -1 is safe EMPTY
    var key = 0L
    var i = 0
    while (i < k - 1) {
      key = (key << 8) | (org.apache.spark.unsafe.Platform.getByte(base, off + i) & 0xffL)
      i += 1
    }
    var maxC = 0
    while (i < nBytes) {
      key = ((key << 8) |
        (org.apache.spark.unsafe.Platform.getByte(base, off + i) & 0xffL)) & mask
      var idx = XXH64.hashLong(key, 42L).toInt & (cap - 1)
      while (keys(idx) != key && keys(idx) != -1L) idx = (idx + 1) & (cap - 1)
      if (keys(idx) == -1L) {
        keys(idx) = key; cnts(idx) = 1
        if (maxC < 1) maxC = 1
      } else {
        cnts(idx) += 1
        if (cnts(idx) > maxC) maxC = cnts(idx)
      }
      i += 1
    }
    maxC.toLong * 1000000L / n
  }

  /** Exact repetition ratio via offset sort — the memory-light fallback
    * for oversized rows: instead of a per-gram hash map, sort the gram
    * START POSITIONS by gram bytes (3-way quicksort, so the degenerate
    * all-grams-equal spam case partitions in one pass instead of
    * quadratically) and take the longest equal run. Allocates two int
    * arrays (~8 B/char) regardless of gram distinctness. */
  def repetitionPpmSorted(text: UTF8String, k: Int): Long = {
    val base = text.getBaseObject
    val off = text.getBaseOffset
    val nBytes = text.numBytes()
    val nChars = text.numChars()
    val n = math.max(nChars - k + 1, 1)
    val charOff = charOffsets(text)
    // gram i (0-based) spans bytes [charOff(i), charOff(min(i+k, nChars)))
    @inline def gramStart(g: Int): Int = charOff(g)
    @inline def gramEnd(g: Int): Int = charOff(math.min(g + k, nChars))
    // byte-lexicographic order (any total order works — equal grams just
    // need to be adjacent after the sort)
    def cmp(a: Int, b: Int): Int = {
      var ia = gramStart(a); val ea = gramEnd(a)
      var ib = gramStart(b); val eb = gramEnd(b)
      while (ia < ea && ib < eb) {
        val ba = org.apache.spark.unsafe.Platform.getByte(base, off + ia) & 0xff
        val bb = org.apache.spark.unsafe.Platform.getByte(base, off + ib) & 0xff
        if (ba != bb) return ba - bb
        ia += 1; ib += 1
      }
      (ea - gramStart(a)) - (eb - gramStart(b))
    }
    val idx = new Array[Int](n)
    var i = 0
    while (i < n) { idx(i) = i; i += 1 }
    // iterative 3-way quicksort (explicit stack — no recursion depth risk)
    val stack = new java.util.ArrayDeque[Int]()
    stack.push(0); stack.push(n - 1)
    while (!stack.isEmpty) {
      val hi = stack.pop(); val lo = stack.pop()
      if (lo < hi) {
        if (hi - lo < 12) {
          // insertion sort for small ranges
          var a = lo + 1
          while (a <= hi) {
            val v = idx(a); var b = a - 1
            while (b >= lo && cmp(idx(b), v) > 0) { idx(b + 1) = idx(b); b -= 1 }
            idx(b + 1) = v; a += 1
          }
        } else {
          // median-of-3 pivot, Dutch-flag partition
          val mid = lo + (hi - lo) / 2
          val pivot =
            if (cmp(idx(lo), idx(mid)) <= 0) {
              if (cmp(idx(mid), idx(hi)) <= 0) idx(mid)
              else if (cmp(idx(lo), idx(hi)) <= 0) idx(hi) else idx(lo)
            } else {
              if (cmp(idx(lo), idx(hi)) <= 0) idx(lo)
              else if (cmp(idx(mid), idx(hi)) <= 0) idx(hi) else idx(mid)
            }
          var lt = lo; var gt = hi; var p = lo
          while (p <= gt) {
            val c = cmp(idx(p), pivot)
            if (c < 0) { val t = idx(lt); idx(lt) = idx(p); idx(p) = t; lt += 1; p += 1 }
            else if (c > 0) { val t = idx(gt); idx(gt) = idx(p); idx(p) = t; gt -= 1 }
            else p += 1
          }
          stack.push(lo); stack.push(lt - 1)
          stack.push(gt + 1); stack.push(hi)
        }
      }
    }
    // longest equal run = max gram count
    var maxC = 1
    var run = 1
    i = 1
    while (i < n) {
      if (cmp(idx(i - 1), idx(i)) == 0) { run += 1; if (run > maxC) maxC = run }
      else run = 1
      i += 1
    }
    maxC.toLong * 1000000L / n
  }

  /** 64-bit SimHash of a space-tokenized text in ONE byte-level pass:
    * tokens are maximal runs between 0x20 bytes (0x20 never occurs inside
    * a UTF-8 multi-byte sequence, so byte split == char split), each
    * hashed with xxhash64 (seed 42, like Spark's `xxhash64(token)`), each
    * voting ±1 per bit. Replaces `simhash64(transform(split(text, " "),
    * xxhash64))` — the transform ran interpreted per token and
    * materialized the hash array. Split semantics mirror Spark's
    * `split(text, " ")` (Java split with -1 limit): empty tokens between
    * adjacent/leading spaces ARE hashed; the empty text is one empty
    * token; trailing empty tokens are DROPPED only when Java would drop
    * them — Spark keeps them (limit -1), so we keep them too.
    *
    * Caveat (documented divergence): text containing INVALID UTF-8 (only
    * reachable via binary→string casts; parquet strings are valid by
    * construction) hashes the original bytes here, whereas `split` round-
    * trips through String and re-encodes bad sequences as U+FFFD first —
    * such text has an unspecified (but stable) signature. */
  def simhashText(text: UTF8String): Long = {
    val base = text.getBaseObject
    val offset = text.getBaseOffset
    val nBytes = text.numBytes()
    val votes = new Array[Int](64)
    var start = 0
    var i = 0
    while (i <= nBytes) {
      val atEnd = i == nBytes
      if (atEnd || org.apache.spark.unsafe.Platform.getByte(base, offset + i) == 0x20.toByte) {
        SignatureKernels.vote(votes,
          XXH64.hashUnsafeBytes(base, offset + start, i - start, 42L))
        start = i + 1
      }
      i += 1
    }
    SignatureKernels.collapseVotes(votes)
  }

  /** Minimum md5 over k-char shingles as a lowercase hex string (see
    * [[MinShingleMd5]]). Shingles follow `substr` char semantics with the
    * usual sub-k clamp; md5 is over the shingle's UTF-8 bytes, matching
    * `md5(substr(...).cast("binary"))`. */
  def minShingleMd5(text: UTF8String, k: Int): UTF8String = {
    val nChars = text.numChars()
    val n = math.max(nChars - k + 1, 1)
    // one byte copy + the charOffsets table: each shingle's bytes are
    // addressed directly — substringSQL would re-walk from byte 0 per
    // gram, O(n^2) in doc length (one multi-MB doc = an hours-long task)
    val bytes = text.getBytes
    val charOff = charOffsets(text)
    val md = java.security.MessageDigest.getInstance("MD5")
    var best: Array[Byte] = null
    var i = 0
    while (i < n) {
      val from = charOff(i)
      val until = charOff(math.min(i + k, nChars))
      md.update(bytes, from, until - from)
      val d = md.digest()
      if (best == null || unsignedLess(d, best)) best = d
      i += 1
    }
    val hex = new StringBuilder(32)
    var b = 0
    while (b < best.length) {
      hex.append(Character.forDigit((best(b) >> 4) & 0xf, 16))
      hex.append(Character.forDigit(best(b) & 0xf, 16))
      b += 1
    }
    UTF8String.fromString(hex.toString)
  }

  private def unsignedLess(a: Array[Byte], b: Array[Byte]): Boolean = {
    var i = 0
    while (i < a.length && i < b.length) {
      val x = a(i) & 0xff
      val y = b(i) & 0xff
      if (x != y) return x < y
      i += 1
    }
    a.length < b.length
  }

  /** One BPE merge round over a symbol array — the [[MergePair]] kernel:
    * greedy left-to-right, non-overlapping. Null slots pass through
    * unmerged (never present in the trainer's arrays). */
  def mergePair(arr: org.apache.spark.sql.catalyst.util.ArrayData,
                left: UTF8String, right: UTF8String)
      : org.apache.spark.sql.catalyst.util.ArrayData = {
    val n = arr.numElements()
    val out = new java.util.ArrayList[Any](n)
    var i = 0
    while (i < n) {
      if (i < n - 1 && !arr.isNullAt(i) && !arr.isNullAt(i + 1) &&
          left.equals(arr.getUTF8String(i)) && right.equals(arr.getUTF8String(i + 1))) {
        out.add(UTF8String.concat(arr.getUTF8String(i), arr.getUTF8String(i + 1)))
        i += 2
      } else {
        out.add(if (arr.isNullAt(i)) null else arr.getUTF8String(i))
        i += 1
      }
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out.toArray)
  }

  /** Adjacent `width`-grams of a string array, each joined by `sep` —
    * the [[AdjacentJoin]] kernel (width 2 = the bigram builder; width 3
    * feeds the BPE batcher's created-pair bounds). Windows touching a
    * null slot are skipped (token arrays are containsNull=false in every
    * declared path; the guard covers arbitrary SQL callers). */
  def adjacentJoin(a: org.apache.spark.sql.catalyst.util.ArrayData,
                   sep: UTF8String, width: Int): org.apache.spark.sql.catalyst.util.ArrayData = {
    val n = a.numElements()
    if (n < width)
      return new org.apache.spark.sql.catalyst.util.GenericArrayData(new Array[Any](0))
    val out = new java.util.ArrayList[Any](n - width + 1)
    var i = 0
    while (i <= n - width) {
      var ok = true
      var j = 0
      while (ok && j < width) { if (a.isNullAt(i + j)) ok = false; j += 1 }
      if (ok) {
        var acc = a.getUTF8String(i)
        j = 1
        while (j < width) { acc = UTF8String.concat(acc, sep, a.getUTF8String(i + j)); j += 1 }
        out.add(acc)
      }
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out.toArray)
  }
}

/** `min_shingle_md5(text)` → `string`: the minimum md5 hex over all
  * k-char shingles (winnowing-style fingerprint). One pass, one
  * MessageDigest per row, digests compared as unsigned bytes (hex
  * lexicographic order == unsigned byte order), only the winner
  * hex-encoded — the former `array_min(transform(...))` ran an
  * interpreted md5 per shingle and materialized the hex array. */
case class MinShingleMd5(child: Expression, k: Int)
  extends UnaryExpression with ExpectsInputTypes {

  require(k > 0, s"k must be positive, got $k")

  override def inputTypes = Seq(StringType)
  override def dataType: DataType = StringType
  override def prettyName: String = "min_shingle_md5"

  override protected def nullSafeEval(input: Any): Any =
    TextKernels.minShingleMd5(input.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextKernels.minShingleMd5($c, $k)")

  override protected def withNewChildInternal(newChild: Expression): MinShingleMd5 =
    copy(child = newChild)
}

object MinShingleMd5 {
  /** Column wrapper. */
  def apply(text: Column, k: Int): Column =
    ColumnBridge.column(MinShingleMd5(ColumnBridge.expression(text), k))
}

/** `repetition_ppm(text)` → `long` (k baked into the plan). */
case class RepetitionPpm(child: Expression, k: Int,
    maxMapChars: Int = TextKernels.RepetitionMapMaxChars)
  extends UnaryExpression with ExpectsInputTypes {

  require(k > 0, s"k must be positive, got $k")
  require(maxMapChars >= 0, s"maxMapChars must be non-negative, got $maxMapChars")

  override def inputTypes = Seq(StringType)
  override def dataType: DataType = LongType
  override def prettyName: String = "repetition_ppm"

  override protected def nullSafeEval(input: Any): Any =
    TextKernels.repetitionPpm(input.asInstanceOf[UTF8String], k, maxMapChars)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.TextKernels.repetitionPpm($c, $k, $maxMapChars)")

  override protected def withNewChildInternal(newChild: Expression): RepetitionPpm =
    copy(child = newChild)
}

object RepetitionPpm {
  /** Column wrapper. */
  def apply(text: Column, k: Int): Column =
    ColumnBridge.column(RepetitionPpm(ColumnBridge.expression(text), k))

  /** Column wrapper with an explicit map-path cap (tests; opt-in tuning). */
  def apply(text: Column, k: Int, maxMapChars: Int): Column =
    ColumnBridge.column(RepetitionPpm(ColumnBridge.expression(text), k, maxMapChars))
}

/** `simhash_text(text)` → `long`: fused tokenize + hash + vote. */
case class SimHashText(child: Expression)
  extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes = Seq(StringType)
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash_text"

  override protected def nullSafeEval(input: Any): Any =
    TextKernels.simhashText(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextKernels.simhashText($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHashText =
    copy(child = newChild)
}

object SimHashText {
  /** Column wrapper. */
  def apply(text: Column): Column =
    ColumnBridge.column(SimHashText(ColumnBridge.expression(text)))
}

/** `merge_pair(arr)` → `array<string>`: one BPE merge round over a symbol
  * sequence — every adjacent (left, right) occurrence becomes the single
  * symbol left+right, greedy left-to-right, non-overlapping (canonical
  * Sennrich et al. 2016 semantics: ["a","a","a"] merging (a,a) →
  * ["aa","a"]). A kernel rather than a join-string replace because
  * substring search cannot respect symbol boundaries ("aa"+SEP+"b"
  * contains the bytes of "a"+SEP+"b") and boundary sentinels break on
  * back-to-back occurrences. */
case class MergePair(child: Expression, left: String, right: String)
  extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes =
    Seq(org.apache.spark.sql.types.ArrayType(StringType))
  // same element nullability as the input: null slots pass through
  override def dataType: DataType = child.dataType
  override def prettyName: String = "merge_pair"

  override protected def nullSafeEval(input: Any): Any =
    TextKernels.mergePair(
      input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      UTF8String.fromString(left), UTF8String.fromString(right))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val l = ctx.addReferenceObj("mergeLeft", UTF8String.fromString(left),
      "org.apache.spark.unsafe.types.UTF8String")
    val r = ctx.addReferenceObj("mergeRight", UTF8String.fromString(right),
      "org.apache.spark.unsafe.types.UTF8String")
    defineCodeGen(ctx, ev,
      c => s"graft.functions.TextKernels.mergePair($c, $l, $r)")
  }

  override protected def withNewChildInternal(newChild: Expression): MergePair =
    copy(child = newChild)
}

object MergePair {
  /** Column wrapper. */
  def apply(arr: Column, left: String, right: String): Column =
    ColumnBridge.column(MergePair(ColumnBridge.expression(arr), left, right))
}

/** `adjacent_join(arr, sep[, width])` → `array<string>` of each adjacent
  * `width`-gram joined by `sep` (default width 2: the bigram builder) —
  * adjacent-window enumeration as a codegen'd projection instead of an
  * interpreted `zip_with`/`transform` (this runs inside the corpus scan,
  * where the HOF ban applies) or a lead()-window (which would shuffle the
  * corpus). Null elements produce no window. */
case class AdjacentJoin(child: Expression, sep: String, width: Int = 2)
  extends UnaryExpression with ExpectsInputTypes {

  require(width >= 2, s"width must be >= 2, got $width")

  override def inputTypes =
    Seq(org.apache.spark.sql.types.ArrayType(StringType))
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(StringType, containsNull = false)
  override def prettyName: String = "adjacent_join"

  override protected def nullSafeEval(input: Any): Any =
    TextKernels.adjacentJoin(
      input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      UTF8String.fromString(sep), width)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val sepRef = ctx.addReferenceObj("sep", UTF8String.fromString(sep),
      "org.apache.spark.unsafe.types.UTF8String")
    defineCodeGen(ctx, ev,
      c => s"graft.functions.TextKernels.adjacentJoin($c, $sepRef, $width)")
  }

  override protected def withNewChildInternal(newChild: Expression): AdjacentJoin =
    copy(child = newChild)
}

object AdjacentJoin {
  /** Column wrapper. */
  def apply(arr: Column, sep: String): Column =
    ColumnBridge.column(AdjacentJoin(ColumnBridge.expression(arr), sep))
  /** Column wrapper, explicit window width. */
  def apply(arr: Column, sep: String, width: Int): Column =
    ColumnBridge.column(AdjacentJoin(ColumnBridge.expression(arr), sep, width))
}
