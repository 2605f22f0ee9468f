package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.unsafe.types.UTF8String

/** Scalar kernel for [[graft.ops.Pii]] — the 5-category count-and-redact
  * chain (email, ipv4, phone, ssn, idnum) as five sequential HAND-ROLLED
  * scans instead of five `regexp_count` + five `regexp_replace` passes
  * (10 full regex-engine traversals per document; the r16 sf1.0 sweep put
  * the chain at 16.3 s for 50k docs, one of the four scan-floor rows —
  * the constant factor IS the lever at a linear floor).
  *
  * STRUCTURE: the pass sequence is kept EXACTLY as the defining chain
  * ([[graft.ops.Pii.categories]] — what the DuckDB oracle replays); only
  * each pass's regex engine is replaced by a specialized matcher that
  * mirrors Java-regex semantics for that one pattern (greedy octets
  * collapse to full-run checks because any shorter take is followed by a
  * digit; the email domain backtracks from the longest `[A-Za-z0-9.-]+`
  * consumption to the last `.` with ≥ 2 letters; the phone's optional
  * prefix tries 2 then 1 digits then group-absent). Like Java's Matcher,
  * `\b` is judged on the PASS INPUT while the replacement accumulates
  * separately, and after a match the scan resumes at its end
  * (non-overlapping, leftmost-first). A pass that matches nothing
  * returns its input unchanged — the common case for clean documents is
  * five scans and zero string rebuilds.
  *
  * A single-pass priority-at-position design was tried first and
  * REJECTED: PiiKernelSpec's fuzzer found two cross-category pass-order
  * inversions through the phone pattern's UNANCHORED optional prefix
  * `(\+?\d{1,2}-)?`, which can start mid-digit-run — the phone pass
  * (3rd) both claims the tail of a would-be idnum run (5th) and shortens
  * a run that an ssn's trailing `\d{4}\b` (4th) needed intact, in each
  * case diverging from positional priority. Sequential passes make the
  * whole class impossible by construction; the fuzzer (adversarial PII
  * soup, boundary-length digit runs, mutated specimens) pins the
  * composition against the literal regex chain.
  */
object PiiScanOps {

  @inline private def isDigit(c: Char): Boolean = c >= '0' && c <= '9'
  @inline private def isLetter(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z')
  @inline private def isWord(c: Char): Boolean =
    isLetter(c) || isDigit(c) || c == '_'
  // email local part: [A-Za-z0-9._%+-]
  @inline private def isLocal(c: Char): Boolean =
    isLetter(c) || isDigit(c) || c == '.' || c == '_' || c == '%' ||
      c == '+' || c == '-'
  // email domain: [A-Za-z0-9.-] (NO underscore/percent/plus)
  @inline private def isDomain(c: Char): Boolean =
    isLetter(c) || isDigit(c) || c == '.' || c == '-'

  @inline private def digitRun(s: String, i: Int): Int = {
    var j = i
    while (j < s.length && isDigit(s.charAt(j))) j += 1
    j - i
  }

  /** `[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}` — match end
    * (exclusive) for a match starting at `i`, or -1. No `\b` anywhere.
    */
  private def emailEnd(s: String, i: Int): Int = {
    val n = s.length
    if (!isLocal(s.charAt(i))) return -1
    var j = i
    while (j < n && isLocal(s.charAt(j))) j += 1
    if (j >= n || s.charAt(j) != '@') return -1
    var k = j + 1
    while (k < n && isDomain(s.charAt(k))) k += 1
    if (k == j + 1) return -1 // domain+ needs >= 1 char before the dot
    // backtrack the greedy domain+ from its longest consumption: the dot
    // sits at p (>= j+2 so domain+ keeps >= 1 char), letters{2,} greedy
    var p = k - 1
    while (p >= j + 2) {
      if (s.charAt(p) == '.') {
        var q = p + 1
        while (q < n && isLetter(s.charAt(q))) q += 1
        if (q - (p + 1) >= 2) return q
      }
      p -= 1
    }
    -1
  }

  /** `\b\d{1,3}(\.\d{1,3}){3}\b` — an octet's backtracking collapses:
    * only the full digit run can be followed by `.` (any shorter take
    * sees a digit).
    */
  private def ipv4End(s: String, i: Int, prevNonWord: Boolean): Int = {
    if (!prevNonWord || !isDigit(s.charAt(i))) return -1
    val n = s.length
    var cur = i
    var o = 0
    while (o < 3) {
      val r = digitRun(s, cur)
      if (r < 1 || r > 3 || cur + r >= n || s.charAt(cur + r) != '.') return -1
      cur += r + 1
      o += 1
    }
    val r = digitRun(s, cur)
    if (r < 1 || r > 3) return -1
    val e = cur + r
    if (e < n && isWord(s.charAt(e))) -1 else e
  }

  /** `\d{3}-\d{3}-\d{4}\b` at `c` (the `\b` before `c` is the caller's
    * concern). Exact-width groups: a longer run fails the separator
    * check, a shorter one the width check.
    */
  private def phoneCore(s: String, c: Int): Int = {
    val n = s.length
    if (digitRun(s, c) < 3 || c + 3 >= n || s.charAt(c + 3) != '-') return -1
    if (digitRun(s, c + 4) < 3 || c + 7 >= n || s.charAt(c + 7) != '-') return -1
    if (digitRun(s, c + 8) != 4) return -1
    val e = c + 12
    if (e < n && isWord(s.charAt(e))) -1 else e
  }

  /** `(\+?\d{1,2}-)?\b\d{3}-\d{3}-\d{4}\b` — the optional prefix needs
    * no boundary (bare `555-123-4567` does). Java's order: group present
    * (`\d{1,2}` greedy: 2 then 1), then group absent at the same
    * position.
    */
  private def phoneEnd(s: String, i: Int, prevNonWord: Boolean): Int = {
    val n = s.length
    val c0 = s.charAt(i)
    if (c0 != '+' && !isDigit(c0)) return -1
    var c = i
    var hasPlus = false
    if (c0 == '+') { hasPlus = true; c += 1 }
    val r = digitRun(s, c)
    if (r >= 1) {
      var take = math.min(r, 2)
      while (take >= 1) {
        if (c + take < n && s.charAt(c + take) == '-') {
          val e = phoneCore(s, c + take + 1)
          if (e > 0) return e
        }
        take -= 1
      }
    }
    // group absent: `\b` before \d{3}; a '+' start can never match here
    if (!hasPlus && prevNonWord) phoneCore(s, i) else -1
  }

  /** `\b\d{3}-\d{2}-\d{4}\b`. */
  private def ssnEnd(s: String, i: Int, prevNonWord: Boolean): Int = {
    if (!prevNonWord || !isDigit(s.charAt(i))) return -1
    val n = s.length
    if (digitRun(s, i) < 3 || i + 3 >= n || s.charAt(i + 3) != '-') return -1
    if (digitRun(s, i + 4) < 2 || i + 6 >= n || s.charAt(i + 6) != '-') return -1
    if (digitRun(s, i + 7) != 4) return -1
    val e = i + 11
    if (e < n && isWord(s.charAt(e))) -1 else e
  }

  /** `\b\d{13,18}\b`: the run must BE the match — a 19+ run leaves a
    * digit after any allowed take.
    */
  private def idnumEnd(s: String, i: Int, prevNonWord: Boolean): Int = {
    if (!prevNonWord || !isDigit(s.charAt(i))) return -1
    val r = digitRun(s, i)
    if (r < 13 || r > 18) return -1
    val e = i + r
    if (e < s.length && isWord(s.charAt(e))) -1 else e
  }

  private val Placeholders =
    Array("[EMAIL]", "[IP]", "[PHONE]", "[SSN]", "[ID]")

  /** One replaceAll pass of category `kind` over `s`: Matcher semantics —
    * `\b` judged on the INPUT, leftmost-first, resume at match end.
    * Returns the INPUT instance itself when nothing matched.
    */
  private def onePass(s: String, kind: Int, counts: Array[Int]): String = {
    val n = s.length
    var sb: java.lang.StringBuilder = null // allocated on first match only
    var copied = 0
    var i = 0
    while (i < n) {
      val prevNonWord = i == 0 || !isWord(s.charAt(i - 1))
      val e = kind match {
        case 0 => if (isLocal(s.charAt(i))) emailEnd(s, i) else -1
        case 1 => ipv4End(s, i, prevNonWord)
        case 2 => phoneEnd(s, i, prevNonWord)
        case 3 => ssnEnd(s, i, prevNonWord)
        case _ => idnumEnd(s, i, prevNonWord)
      }
      if (e > 0) {
        if (sb == null) sb = new java.lang.StringBuilder(n)
        sb.append(s, copied, i).append(Placeholders(kind))
        counts(kind) += 1
        copied = e
        i = e
      } else i += 1
    }
    if (sb == null) s
    else { sb.append(s, copied, n); sb.toString }
  }

  /** The full chain: returns (clean, n_email, n_ipv4, n_phone, n_ssn,
    * n_idnum) as an InternalRow.
    */
  def scan(text: UTF8String): InternalRow = {
    val counts = new Array[Int](5)
    var s = text.toString
    var k = 0
    while (k < 5) { s = onePass(s, k, counts); k += 1 }
    new GenericInternalRow(Array[Any](UTF8String.fromString(s),
      counts(0), counts(1), counts(2), counts(3), counts(4)))
  }
}
