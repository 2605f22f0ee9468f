package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.unsafe.types.UTF8String

/** Hot-path text hashing kernels for the dedup/fingerprint operators.
  *
  * These are plain-JVM static methods invoked from generated code by the
  * expressions in [[TextHashExpressions]] — one call per row, tight
  * primitive loops inside, zero Catalyst interpretation. They replace the
  * round-1 higher-order-function pipelines (`transform`/`aggregate`), which
  * are CodegenFallback and interpret every lambda step per element
  * (measured 46-106 s per query at sf0.1; see VERDICT.md round 1).
  *
  * Every formula here is *oracle-shared*: the identical arithmetic is
  * expressible in DuckDB SQL with no 64-bit overflow, so the driver's
  * correctness gate can recompute signatures/buckets exactly:
  *
  *  - word/shingle hash: rolling polynomial `h = (h*31 + c) mod (2^57-13)`
  *    over the normalized characters. 31*(2^57) < 2^62 — safe in BIGINT on
  *    both engines; 57 bits makes cross-document collisions negligible
  *    (~1e-6 at 5e5 distinct shingles).
  *  - minhash variant j: `(aj*x + bj) mod (2^31-1)` over `x = h mod (2^31-1)`
  *    with small constants aj=2j+3, bj=j²+7j+41 (products < 2^38).
  *  - simhash: 31-bit, votes from the bits of the word hash mod (2^31-1).
  *
  * Normalization contract (must equal `TextAnalysis.words`):
  * lowercase, any char outside [a-z0-9] is a separator, empty tokens
  * dropped. Implemented byte-level over UTF-8: multi-byte sequences become
  * separators, which tokenizes identically to the regex path for ASCII
  * text (the testdata contract) — documented ASCII-only fast path.
  */
object TextHashOps {

  /** 57-bit Mersenne-ish modulus: (h*31 + c) stays under 2^63. */
  final val P57: Long = (1L << 57) - 13
  /** 2^31 - 1: the minhash/simhash variant field. */
  final val P31: Long = 2147483647L

  /** MINSTD Lehmer multiplier — the sketch family's position mixer. */
  final val LehmerA: Long = 48271L
  // Schrage decomposition P57 = LehmerQ·LehmerA + LehmerR. LehmerR < LehmerA
  // < sqrt(P57) < LehmerQ, the Schrage condition, so one Lehmer round is
  // exact in int64: A·(x%Q) < A·Q <= P57 and R·(x/Q) < A² < 2^32.
  private final val LehmerQ: Long = P57 / LehmerA
  private final val LehmerR: Long = P57 % LehmerA
  // (2^63) mod P57 — the one input (h = Long.MaxValue) whose +1 rotation
  // overflows int64; the DECIMAL(38,0) definition widens instead, so the
  // long path pins this single value as a constant.
  private final val MaxLongPlusOneModP57: Long =
    ((BigInt(1) << 63) % P57).toLong

  /** `rounds` Lehmer rounds `·48271 mod P57` of `h + 1`, exact in int64
    * via Schrage's decomposition — value-identical on the FULL long line
    * (negatives, overflow edge included) to the sketch family's defining
    * DECIMAL(38,0) chain `(…((h+1)·48271 % P57)…·48271 % P57)`, whose
    * `%` is truncated (sign of dividend). rounds = 2 is
    * [[graft.ops.Sketch.mixedPosition]], rounds = 3 its third round.
    * LehmerMixSpec pins equality against a BigInt reference over the
    * whole line; called from whole-stage codegen (no Decimal allocation
    * per row — measured sf0.1 sketch-family bench 10.6 -> 9.7 s, the
    * shingle-heavy KMV/CMS builds 0.70-0.87x; the distinct shuffle
    * bounds the win, and the per-row term it removes grows with shingle
    * volume at larger corpora).
    */
  def lehmerMix(h: Long, rounds: Int): Long = {
    var x =
      if (h == Long.MaxValue) MaxLongPlusOneModP57
      else (h + 1) % P57 // truncated %, |x| < P57, sign of h+1
    var i = 0
    while (i < rounds) {
      // truncated-remainder round: sign rides outside the positive Schrage
      val neg = x < 0
      val ax = if (neg) -x else x
      val t = LehmerA * (ax % LehmerQ) - LehmerR * (ax / LehmerQ)
      val m = if (t < 0) t + P57 else t
      x = if (neg) -m else m
      i += 1
    }
    x
  }

  @inline private def isKeep(b: Byte): Boolean =
    (b >= 'a' && b <= 'z') || (b >= '0' && b <= '9')

  @inline private def normByte(b: Byte): Byte =
    if (b >= 'A' && b <= 'Z') (b + 32).toByte else b

  /** Word boundaries of the normalized text as packed (start, end) pairs
    * over a normalized copy of the bytes. Returns the normalized bytes,
    * the boundary array (even=start, odd=end-exclusive), and the
    * normalized length (the copy may be shorter than the input).
    *
    * Normalization = the defining regex chain `lower()` +
    * `[^a-z0-9 ]` → separator, byte-level: ASCII A-Z fold to a-z, every
    * other byte of a multi-byte sequence is a separator — PLUS the only
    * two code points whose Unicode lowercase CONTAINS an ASCII word
    * byte, pre-folded so the kernel equals the chain on ALL input, not
    * just the ASCII line (WordsKernelSpec fuzzes both planes):
    *  - U+212A KELVIN SIGN (e2 84 aa) lowercases to plain 'k' — it
    *    EXTENDS the surrounding word in the chain, so the 3-byte
    *    sequence folds to the single byte 'k';
    *  - U+0130 LATIN CAPITAL I WITH DOT ABOVE (c4 b0) full-lowercases
    *    to 'i' + U+0307 COMBINING DOT ABOVE; the combining dot is
    *    non-ASCII and becomes a separator in the chain, so the 2-byte
    *    sequence folds to 'i' followed by one separator byte.
    * No other code point lowercases into [a-z0-9] (Unicode
    * SpecialCasing's only unconditional multi-char lowercase is U+0130;
    * the single-char map into ASCII is U+212A alone), so this closes
    * the divergence set exactly.
    */
  private def tokenize(text: UTF8String): (Array[Byte], Array[Int]) = {
    val raw = text.getBytes
    val bytes = new Array[Byte](raw.length)
    var i = 0
    var w = 0
    while (i < raw.length) {
      val b = raw(i)
      if (b >= 0) { bytes(w) = normByte(b); i += 1; w += 1 }
      else if (b == 0xe2.toByte && i + 2 < raw.length &&
          raw(i + 1) == 0x84.toByte && raw(i + 2) == 0xaa.toByte) {
        bytes(w) = 'k'; i += 3; w += 1 // U+212A
      } else if (b == 0xc4.toByte && i + 1 < raw.length &&
          raw(i + 1) == 0xb0.toByte) {
        bytes(w) = 'i'; bytes(w + 1) = ' '; i += 2; w += 2 // U+0130
      } else { bytes(w) = b; i += 1; w += 1 } // separator byte
    }
    val bounds = new java.util.ArrayList[Integer]()
    i = 0
    while (i < w) {
      if (isKeep(bytes(i))) {
        val start = i
        while (i < w && isKeep(bytes(i))) i += 1
        bounds.add(start); bounds.add(i)
      } else i += 1
    }
    val arr = new Array[Int](bounds.size())
    var j = 0
    while (j < arr.length) { arr(j) = bounds.get(j); j += 1 }
    (bytes, arr)
  }

  @inline private def foldBytes(h0: Long, bytes: Array[Byte], from: Int, until: Int): Long = {
    var h = h0
    var i = from
    while (i < until) { h = (h * 31 + (bytes(i) & 0xff)) % P57; i += 1 }
    h
  }

  /** One-pass repetition stats: (n_words, n_distinct, max_bigram,
    * n_bigrams, n_chars, n_digit_only) — the inputs of the Gopher-style
    * rule battery (dup-word / top-bigram fractions, mean word length,
    * digit-token fraction). Row-local with a hash map over 57-bit
    * word/bigram hashes: O(words) time and memory per document, versus the
    * explode → count → max form's two corpus shuffles (kept in
    * `TextAnalysis.repetitionSignalsExplode` as the distributed reference;
    * parity pinned). Distinctness is by poly-57 hash — collision odds
    * ~2^-57 per pair, the same accepted risk as the shingle/fingerprint
    * kernels. Bigram hash = the shingle n=2 formula (word, space, word),
    * so the arithmetic stays oracle-shared. `n_chars` (Σ token lengths)
    * and `n_digit_only` (tokens that are entirely '0'-'9') come from the
    * SAME byte-level tokenizer as the word counts — deriving them from a
    * separate `lower()`+regex pass would disagree on non-ASCII input
    * (e.g. U+212A Kelvin lowercases into 'k') and skew the ratios.
    */
  def repetitionStats(text: UTF8String): InternalRow = {
    val (bytes, bounds) = tokenize(text)
    val nWords = bounds.length / 2
    if (nWords == 0)
      return new GenericInternalRow(Array[Any](0, 0, 0L, 0L, 0L, 0))
    val wordHashes = new Array[Long](nWords)
    val distinct = new java.util.HashSet[java.lang.Long]()
    var nChars = 0L
    var nDigitOnly = 0
    var i = 0
    while (i < nWords) {
      val from = bounds(2 * i)
      val until = bounds(2 * i + 1)
      wordHashes(i) = foldBytes(0L, bytes, from, until)
      distinct.add(wordHashes(i))
      nChars += until - from
      var j = from
      while (j < until && bytes(j) >= '0' && bytes(j) <= '9') j += 1
      if (j == until) nDigitOnly += 1
      i += 1
    }
    var maxBigram = 0L
    if (nWords >= 2) {
      val counts = new java.util.HashMap[java.lang.Long, Integer]()
      i = 0
      while (i < nWords - 1) {
        // (wordA ' ' wordB) fold — identical to the n=2 shingle hash
        var h = foldBytes(0L, bytes, bounds(2 * i), bounds(2 * i + 1))
        h = (h * 31 + ' '.toInt) % P57
        h = foldBytes(h, bytes, bounds(2 * i + 2), bounds(2 * i + 3))
        val c = counts.merge(h, 1, (a, b) => a + b)
        if (c > maxBigram) maxBigram = c.toLong
        i += 1
      }
    }
    val nBigrams = if (nWords >= 2) (nWords - 1).toLong else 0L
    new GenericInternalRow(
      Array[Any](nWords, distinct.size(), maxBigram, nBigrams, nChars, nDigitOnly))
  }

  /** [[classifierScore]]'s TRAINED twin: the per-word feature weight comes
    * from a caller-supplied bucket-indexed table (a trained model
    * artifact, e.g. [[graft.ops.Classifier.train]]'s output) instead of
    * the committed Lehmer formula. Same one-pass shape: tokenize once,
    * fold `weights[wordHash mod numBuckets]` exactly in a long.
    * `weights.length` must equal `numBuckets` (checked by the expression
    * constructor, not per row).
    */
  def classifierScoreWeighted(text: UTF8String, weights: Array[Long],
      numBuckets: Int): InternalRow = {
    val (bytes, bounds) = tokenize(text)
    val nWords = bounds.length / 2
    var sum = 0L
    var i = 0
    while (i < nWords) {
      val h = foldBytes(0L, bytes, bounds(2 * i), bounds(2 * i + 1))
      sum += weights((h % numBuckets).toInt)
      i += 1
    }
    new GenericInternalRow(Array[Any](nWords, sum))
  }

  /** Aligned character-window passage hashes: the poly-57 hash of the RAW
    * bytes `[i*stride, i*stride + window)` for every full window — the key
    * for VERBATIM repeated-passage detection (no normalization: verbatim
    * means byte-identical; ASCII contract as above so the oracle's
    * per-character ascii() fold matches byte-for-byte). A shared passage
    * is detected when it starts at the same offset mod `stride` in both
    * documents — the standard stride/recall trade; stride = 1 is
    * exhaustive at `window×` the hashing cost.
    */
  def passageHashes(text: UTF8String, window: Int, stride: Int): ArrayData = {
    val bytes = text.getBytes
    if (bytes.length < window) return new GenericArrayData(Array.emptyLongArray)
    val n = (bytes.length - window) / stride + 1
    val out = new Array[Long](n)
    var i = 0
    while (i < n) {
      out(i) = foldBytes(0L, bytes, i * stride, i * stride + window)
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Per-word 57-bit rolling hashes of the normalized text, in document
    * order WITH multiplicity — bag-of-words semantics for the hashed-
    * feature classifier ([[graft.ops.Classifier]]). [[shingleHashes]] with
    * n = 1 is NOT equivalent: it dedups to first-occurrence order, which
    * would collapse repeated words to a single feature count.
    */
  def wordHashes(text: UTF8String): ArrayData = {
    val (bytes, bounds) = tokenize(text)
    val n = bounds.length / 2
    val out = new Array[Long](n)
    var i = 0
    while (i < n) {
      out(i) = foldBytes(0L, bytes, bounds(2 * i), bounds(2 * i + 1))
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Normalized words of the text, in document order with multiplicity —
    * the one-pass kernel behind [[graft.ops.TextAnalysis.words]], whose
    * defining regex chain `filter(split(regexp_replace(lower(text),
    * "[^a-z0-9 ]", " "), " "), length > 0)` costs three full passes and
    * a regex per document. Equal to the chain on ALL input: byte-level
    * normalization treats multi-byte sequences as separators exactly as
    * the chain's lower-then-strip does, and [[tokenize]] pre-folds the
    * only two code points whose Unicode lowercase contains an ASCII
    * word byte (U+212A → 'k', U+0130 → 'i' + separator).
    * WordsKernelSpec fuzz-pins the equality over the ASCII line AND a
    * Unicode plane seeded with exactly those divergence-class chars.
    */
  def wordsArr(text: UTF8String): ArrayData = {
    val (bytes, bounds) = tokenize(text)
    val n = bounds.length / 2
    val out = new Array[Any](n)
    var i = 0
    while (i < n) {
      val start = bounds(2 * i)
      out(i) = UTF8String.fromBytes(bytes, start, bounds(2 * i + 1) - start)
      i += 1
    }
    new GenericArrayData(out)
  }

  /** One-pass hashed-feature linear score: (n_words, score_sum) where
    * score_sum = Σ over word occurrences of the bucket weight
    * `((h mod numBuckets + 1) * 48271) mod 2001 - 1000` over the word's
    * poly-57 hash `h`. The fused hot path of [[graft.ops.Classifier]] —
    * the HOF fold over [[wordHashes]] is the parity-pinned reference.
    * Integer-only, oracle-shared arithmetic.
    */
  def classifierScore(text: UTF8String, numBuckets: Int): InternalRow = {
    val (bytes, bounds) = tokenize(text)
    val n = bounds.length / 2
    var sum = 0L
    var i = 0
    while (i < n) {
      val h = foldBytes(0L, bytes, bounds(2 * i), bounds(2 * i + 1))
      sum += ((h % numBuckets + 1) * 48271L) % 2001L - 1000L
      i += 1
    }
    new GenericInternalRow(Array[Any](n, sum))
  }

  /** POSITIONAL n-word shingle hashes: one hash per starting word index,
    * in order, NO dedup — index i of the result is the shingle starting at
    * word i. The span-level consumers ([[graft.ops.Decontaminate]]'s
    * redaction) need the position ↔ hash correspondence that
    * [[shingleHashes]]'s distinct-set form erases. Same arithmetic, so a
    * hash here equals the [[shingleHashes]] value of the same shingle.
    */
  def shingleHashesAt(text: UTF8String, n: Int): ArrayData = {
    val (bytes, bounds) = tokenize(text)
    val nWords = bounds.length / 2
    if (nWords < n) return new GenericArrayData(Array.emptyLongArray)
    val out = new Array[Long](nWords - n + 1)
    var i = 0
    while (i <= nWords - n) {
      var h = 0L
      var j = i
      while (j < i + n) {
        h = foldBytes(h, bytes, bounds(2 * j), bounds(2 * j + 1))
        if (j < i + n - 1) h = (h * 31 + ' '.toInt) % P57
        j += 1
      }
      out(i) = h
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Winnowing fingerprints (Schleimer, Wilkerson & Aiken 2003 — the
    * MOSS local fingerprinting algorithm): poly-57 hashes of all char
    * `k`-grams, then in every window of `w` consecutive gram hashes keep
    * the MINIMUM (ties → rightmost), each selection recorded once. The
    * guarantee stride alignment lacks: any verbatim match of length
    * ≥ `w + k − 1` chars shares at least one fingerprint REGARDLESS of
    * its offset in either document. Density is ~2/(w+1) of all grams.
    * Returns `array<struct<pos:int, h:long>>` in position order
    * (0-based char start of the selected gram). Texts with fewer than
    * `k` chars have no grams; with grams but fewer than `w` of them,
    * one global minimum is selected (the standard short-text rule).
    * O(n·w) per row — w is a small constant; docs are row-local.
    */
  def winnowHashes(text: UTF8String, k: Int, w: Int): ArrayData = {
    val bytes = text.getBytes
    val n = bytes.length - k + 1
    if (n <= 0) return new GenericArrayData(Array.empty[Any])
    val g = new Array[Long](n)
    var i = 0
    while (i < n) { g(i) = foldBytes(0L, bytes, i, i + k); i += 1 }
    val selected = new Array[Boolean](n)
    val lastWindow = math.max(n - w, 0)
    var j = 0
    while (j <= lastWindow) {
      val end = math.min(j + w, n)
      var mi = j
      var x = j + 1
      while (x < end) { if (g(x) <= g(mi)) mi = x; x += 1 } // <= → rightmost
      selected(mi) = true
      j += 1
    }
    var cnt = 0
    i = 0
    while (i < n) { if (selected(i)) cnt += 1; i += 1 }
    val out = new Array[Any](cnt)
    var o = 0
    i = 0
    while (i < n) {
      if (selected(i)) { out(o) = new GenericInternalRow(Array[Any](i, g(i))); o += 1 }
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Content-defined chunking (the rsync / LBFS / Muthitacharoen et al.
    * 2001 boundary trick): cut AFTER any char `k`-gram whose poly-57
    * hash has its low `maskBits` bits zero. A boundary depends ONLY on
    * the k chars before it, so inserting or deleting bytes shifts at
    * most the chunks it touches — every downstream boundary re-aligns
    * (the robustness fixed-size blocks lack, and the dedup criterion
    * winnowing approximates with fingerprints, expressed here at chunk
    * granularity for STORAGE dedup). Expected chunk length ≈ 2^maskBits
    * chars (geometric; no min/max clamps — clamps would couple a
    * boundary to its predecessor and break the locality guarantee, so
    * the pure rule is kept and documented).
    *
    * Returns `array<struct<start:int, len:int, h:long>>` covering the
    * text exactly (h = poly-57 of the chunk's bytes); texts shorter than
    * `k` are one unbroken chunk; empty text → empty array. O(n·k) per
    * row, row-local.
    */
  def cdcChunks(text: UTF8String, k: Int, maskBits: Int): ArrayData = {
    val bytes = text.getBytes
    val len = bytes.length
    if (len == 0) return new GenericArrayData(Array.empty[Any])
    val n = len - k + 1
    val mask = (1L << maskBits) - 1
    val ends = new Array[Int](math.max(n, 0) + 1)
    var m = 0
    var i = 0
    while (i < n) {
      if ((foldBytes(0L, bytes, i, i + k) & mask) == 0L) { ends(m) = i + k; m += 1 }
      i += 1
    }
    if (m == 0 || ends(m - 1) != len) { ends(m) = len; m += 1 }
    val out = new Array[Any](m)
    var start = 0
    var o = 0
    while (o < m) {
      val e = ends(o)
      out(o) = new GenericInternalRow(
        Array[Any](start, e - start, foldBytes(0L, bytes, start, e)))
      start = e
      o += 1
    }
    new GenericArrayData(out)
  }

  /** Indexes into `hs` whose hash is a member of the SORTED `set` —
    * binary search per element, O(len·log |set|). The frozen-set twin of
    * the broadcast gram join: [[graft.ops.Decontaminate.redactSpansServe]]
    * matches a document's positional gram hashes against a collected
    * benchmark set entirely row-locally (stream-safe — no join, no
    * shuffle, no state).
    */
  def matchedStarts(hs: ArrayData, set: Array[Long]): ArrayData = {
    val n = hs.numElements()
    val buf = new Array[Int](n)
    var k = 0
    var i = 0
    while (i < n) {
      if (java.util.Arrays.binarySearch(set, hs.getLong(i)) >= 0) {
        buf(k) = i
        k += 1
      }
      i += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(buf, k))
  }

  /** Distinct rolling-hash values of the n-word shingles (space-joined),
    * first-occurrence order. Empty when the text has fewer than n words.
    */
  def shingleHashes(text: UTF8String, n: Int): ArrayData = {
    val (bytes, bounds) = tokenize(text)
    val nWords = bounds.length / 2
    if (nWords < n) return new GenericArrayData(Array.emptyLongArray)
    val seen = new java.util.HashSet[java.lang.Long]()
    val out = new Array[Long](nWords - n + 1)
    var m = 0
    var i = 0
    while (i <= nWords - n) {
      var h = 0L
      var j = i
      while (j < i + n) {
        h = foldBytes(h, bytes, bounds(2 * j), bounds(2 * j + 1))
        if (j < i + n - 1) h = (h * 31 + ' '.toInt) % P57
        j += 1
      }
      if (seen.add(h)) { out(m) = h; m += 1 }
      i += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(out, m))
  }

  /** MinHash signature over shingle hashes: sig(j) = min over shingles of
    * ((2j+3)*(h mod P31) + j²+7j+41) mod P31. Empty input → empty array.
    */
  def minhashSig(hashes: ArrayData, k: Int): ArrayData = {
    val n = hashes.numElements()
    if (n == 0) return new GenericArrayData(Array.emptyLongArray)
    val sig = new Array[Long](k)
    java.util.Arrays.fill(sig, Long.MaxValue)
    var i = 0
    while (i < n) {
      val base = hashes.getLong(i) % P31
      var j = 0
      while (j < k) {
        val v = ((2L * j + 3) * base + (j.toLong * j + 7L * j + 41)) % P31
        if (v < sig(j)) sig(j) = v
        j += 1
      }
      i += 1
    }
    new GenericArrayData(sig)
  }

  /** 31-bit SimHash: bit b is set iff the sum over words of
    * ±1 votes from bit b of (wordHash57 mod P31) is positive.
    * Word multiplicity counts (bag semantics). Returns -1 when the text
    * has no words (caller filters; DuckDB mirror filters len(ws)>0).
    */
  def simhash31(text: UTF8String): Long = {
    val (bytes, bounds) = tokenize(text)
    val nWords = bounds.length / 2
    if (nWords == 0) return -1L
    val votes = new Array[Int](31)
    var w = 0
    while (w < nWords) {
      val h = foldBytes(0L, bytes, bounds(2 * w), bounds(2 * w + 1)) % P31
      var b = 0
      while (b < 31) {
        if (((h >> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
      w += 1
    }
    var packed = 0L
    var b = 0
    while (b < 31) { if (votes(b) > 0) packed |= (1L << b); b += 1 }
    packed
  }
}
