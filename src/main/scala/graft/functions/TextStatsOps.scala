package graft.functions

import java.math.RoundingMode

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.unsafe.types.UTF8String

/** One-pass kernel for the text-analysis operator family (language-ID,
  * quality score, token counts, fingerprint). Replaces five separate
  * higher-order-function pipelines (CodegenFallback, interpreted
  * per-element — measured 4.4 s for 5,000 docs at sf0.1) with primitive
  * loops reproducing the EXACT arithmetic of the original column
  * expressions — the DuckDB oracle for `d_text_analysis` is unchanged and
  * TextStatsSpec pins parity against the HOF reference implementation.
  *
  * ASCII fast path, same contract as [[TextHashOps]]: normalization
  * treats every non-[a-z0-9] byte as a separator; counts are byte-based
  * (== char-based for the ASCII testdata).
  */
object TextStatsOps {

  private val P31 = 2147483647L

  private val langs: Array[Array[Array[Byte]]] = Array(
    Array("the", "a", "of", "and", "to", "in", "is", "it"),
    Array("der", "die", "das", "und", "ist", "ein", "zu", "mit"),
    Array("le", "la", "les", "et", "est", "un", "une", "des"),
    Array("el", "los", "las", "y", "es", "un", "una", "con"),
  ).map(_.map(_.getBytes("UTF-8")))

  private val langNames =
    Array("en", "de", "fr", "es").map(UTF8String.fromString)
  private val unknown = UTF8String.fromString("unknown")

  @inline private def isKeep(b: Byte): Boolean =
    (b >= 'a' && b <= 'z') || (b >= '0' && b <= '9')
  @inline private def normByte(b: Byte): Byte =
    if (b >= 'A' && b <= 'Z') (b + 32).toByte else b

  private def wordMatches(bytes: Array[Byte], from: Int, until: Int,
      w: Array[Byte]): Boolean = {
    if (until - from != w.length) return false
    var i = 0
    while (i < w.length) {
      if (bytes(from + i) != w(i)) return false
      i += 1
    }
    true
  }

  /** Mirror of Spark's round(col, 4): BigDecimal.valueOf + HALF_UP. */
  @inline private def round4(x: Double): Double =
    java.math.BigDecimal.valueOf(x).setScale(4, RoundingMode.HALF_UP).doubleValue()

  /** All five analyses in one pass. Result fields (in order):
    * langGuess string, quality double, nTokensWs int, nTokensBpe int,
    * fingerprint long.
    */
  def analyze(text: UTF8String): InternalRow = {
    val raw = text.getBytes

    // --- token/char scans over the RAW bytes, code-point aware -------
    // nChars/nPunct count CODE POINTS (Spark's length()/regexp semantics:
    // one multi-byte char is one char); nTokensBpe = alpha runs + digit
    // runs + single non-alnum-non-ws code points
    var nCharsCp = 0
    var nPunct = 0
    var nBpe = 0
    var i = 0
    while (i < raw.length) {
      val b = raw(i)
      if (b < 0) {
        // multi-byte UTF-8 sequence = one code point: not alnum/space →
        // punct; a single symbol token for the BPE estimate
        nCharsCp += 1; nPunct += 1; nBpe += 1
        i += 1
        while (i < raw.length && (raw(i) & 0xc0) == 0x80) i += 1
      } else {
        val alpha = (b >= 'a' && b <= 'z') || (b >= 'A' && b <= 'Z')
        val digit = b >= '0' && b <= '9'
        if (!(alpha || digit || b == ' ')) nPunct += 1
        if (alpha) { nBpe += 1; val s0 = i; i += 1; while (i < raw.length && {
          val c = raw(i); (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') }) i += 1
          nCharsCp += i - s0 }
        else if (digit) { nBpe += 1; val s0 = i; i += 1
          while (i < raw.length && raw(i) >= '0' && raw(i) <= '9') i += 1
          nCharsCp += i - s0 }
        else {
          nCharsCp += 1
          // single-char symbol token unless whitespace
          if (!(b == ' ' || b == '\t' || b == '\n' || b == '\r' || b == '\f' || b == 0x0B))
            nBpe += 1
          i += 1
        }
      }
    }

    // --- normalized-word scan ----------------------------------------
    val bytes = new Array[Byte](raw.length)
    i = 0
    while (i < raw.length) { bytes(i) = normByte(raw(i)); i += 1 }
    var nWords = 0
    val hits = new Array[Int](4)
    var fp = 0L
    i = 0
    while (i < bytes.length) {
      if (isKeep(bytes(i))) {
        val start = i
        while (i < bytes.length && isKeep(bytes(i))) i += 1
        nWords += 1
        var l = 0
        while (l < 4) {
          val ws = langs(l)
          var k = 0
          while (k < ws.length) {
            if (wordMatches(bytes, start, i, ws(k))) { hits(l) += 1; k = ws.length }
            else k += 1
          }
          l += 1
        }
        // fingerprint fold: v = len(w) + 7*ascii(first char)
        val v = (i - start).toLong + 7L * (bytes(start) & 0xff)
        fp = (fp * 31 + v) % P31
      } else i += 1
    }

    // --- language cascade (en > de > fr > es, unknown on zero hits) ---
    val en = hits(0); val de = hits(1); val fr = hits(2); val es = hits(3)
    val lang =
      if (math.max(math.max(en, de), math.max(fr, es)) == 0) unknown
      else if (en >= math.max(de, math.max(fr, es))) langNames(0)
      else if (de >= math.max(fr, es)) langNames(1)
      else if (fr >= es) langNames(2)
      else langNames(3)

    // --- quality: 0.3*stopRatio + 0.5*lenScore + 0.2*(1-punctRatio) ---
    val nChars = nCharsCp.toDouble
    val stopRatio = if (nWords > 0) en.toDouble / nWords.toDouble else 0.0
    val punctRatio = if (nChars > 0) nPunct.toDouble / nChars else 0.0
    val lenScore = math.min(nWords.toDouble / 100.0, 1.0)
    val quality = round4(math.min(1.0,
      0.3 * stopRatio + 0.5 * lenScore + 0.2 * (1.0 - punctRatio)))

    new GenericInternalRow(Array[Any](lang, quality, nWords, nBpe, fp))
  }
}
