package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PII scrubbing / redaction — the corpus-transform gate every production
  * training-data pipeline runs between raw text and tokenization (the
  * engine's 7 masking functions in access/Access.scala are post-QUERY
  * result masking; this is the pre-training CORPUS pass).
  *
  * Each category is one regular expression replaced by a stable
  * placeholder, applied in a fixed order with the per-category match
  * count emitted alongside — counts are taken on the text as it stands
  * AFTER the previous category's replacement, so every count reflects
  * what this stage actually redacted (an email's digits can never be
  * double-counted as an ID, because the email was already a placeholder
  * by the time the ID pattern runs).
  *
  * Scale shape: ONE projection in the scan stage — a single-pass codegen
  * kernel ([[graft.functions.PiiScanOps]]) that redacts and counts all
  * five categories in one traversal (the defining staged regex chain
  * cost 10 traversals per document; see [[scrubExprs]]). No shuffle, no
  * UDF, scales linearly with input splits; at 100 TB this runs at read
  * throughput next to the quality/language gates it composes with
  * (`d_pipeline_prep`).
  *
  * The regex subset is chosen to behave identically under Java's engine
  * (Spark) and RE2 (the DuckDB oracle): character classes, bounded
  * repetition and `\b` only — no backreferences, no lookaround.
  * NULL text propagates as NULL (clean text and all counts), matching
  * the engine's NULL-in/NULL-out convention for scalar transforms.
  */
object Pii {

  /** (category, pattern, placeholder), applied in order. Order matters
    * twice: emails are redacted before the IP/ID patterns can see their
    * digits, and phone numbers before SSNs so the 3-3-4 grouping is
    * consumed by the more specific pattern first. The country-code prefix
    * is OPTIONAL — bare `555-123-4567` is the most common real-world
    * shape and must redact too (it cannot collide with SSN's 3-2-4
    * grouping). Placeholders contain no digits or `@`, so a later pattern
    * can never match an earlier replacement.
    */
  val categories: Seq[(String, String, String)] = Seq(
    ("email", """[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}""", "[EMAIL]"),
    ("ipv4", """\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b""", "[IP]"),
    ("phone", """(\+?\d{1,2}-)?\b\d{3}-\d{3}-\d{4}\b""", "[PHONE]"),
    ("ssn", """\b\d{3}-\d{2}-\d{4}\b""", "[SSN]"),
    ("idnum", """\b\d{13,18}\b""", "[ID]"),
  )

  /** The scrubbed-text expression and the per-category count expressions
    * for `text` — exposed so callers composing larger single-projection
    * pipelines (or the oracle mirror) can reuse the exact chain.
    *
    * DEFINING form: the staged regex chain over [[categories]] (what the
    * DuckDB oracle replays). SHIPPED form: one field-projected
    * [[graft.functions.PiiScanOps]] scan — the chain cost 10 full regex
    * traversals per document and was one of the four scan-floor rows of
    * the r16 sf1.0 sweep; the kernel is a single pass, byte-equal by
    * the structural argument in its scaladoc and fuzzed against
    * [[chainExprs]] in PiiKernelSpec. Whole-stage codegen's
    * subexpression elimination evaluates the scan once per row across
    * the six field projections (the text_stats precedent).
    */
  def scrubExprs(text: Column): (Column, Seq[(String, Column)]) = {
    val s = graft.functions.TextFunctions.pii_scan(text)
    (s.getField("clean"),
      Seq("email", "ipv4", "phone", "ssn", "idnum").map { cat =>
        (s"n_pii_$cat", s.getField(s"n_$cat"))
      })
  }

  /** The literal staged regex chain — the DEFINITION the kernel must
    * match byte-for-byte (and the DuckDB oracle's form). Kept as the
    * fuzz/parity reference; not on the hot path.
    */
  def chainExprs(text: Column): (Column, Seq[(String, Column)]) = {
    var cur = text
    val counts = categories.map { case (cat, pat, repl) =>
      val n = (s"n_pii_$cat", regexp_count(cur, lit(pat)).cast("int"))
      cur = regexp_replace(cur, pat, repl)
      n
    }
    (cur, counts)
  }

  /** Scrub `textCol`: adds `outCol` (the redacted text) and one
    * `n_pii_<category>` INT column per category. The original text column
    * is kept — drop it at the call site if the raw form must not travel
    * further down the pipeline.
    */
  def scrub(df: DataFrame, textCol: String, outCol: String = "text_clean"): DataFrame = {
    val (clean, counts) = scrubExprs(col(textCol))
    counts.foldLeft(df.withColumn(outCol, clean)) {
      case (acc, (name, expr)) => acc.withColumn(name, expr)
    }
  }
}
