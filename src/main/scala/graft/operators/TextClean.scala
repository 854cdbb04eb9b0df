package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text cleaning for training-data pipelines: whitespace normalization and
  * PII masking (emails / IPv4 / international phone numbers → typed
  * placeholders) — the C4/RefinedWeb-style scrub that runs before dedup
  * and featurization.
  *
  * Everything here is a narrow per-row projection (regexp inside
  * whole-stage codegen, no shuffle, no UDF), so it composes with scan
  * pruning and costs one pass at any corpus size.
  *
  * Regex dialect note: the patterns use only character classes, bounded
  * repetition and `\b` — the subset Java's engine and RE2 (DuckDB)
  * interpret identically, so the oracle can re-run the identical scrub. */
object TextClean {

  /** RE2-and-Java-identical PII patterns, applied in this order. */
  val emailPat = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val ipv4Pat = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
  val phonePat = "\\+\\d{7,15}"

  /** Collapse whitespace runs to single spaces and trim — the tokenizer
    * upstream of every text operator assumes single-space separation.
    * The run class is spelled out rather than `\s` because the shorthand
    * is NOT engine-identical: Java's `\s` includes vertical tab U+000B,
    * RE2's does not — an explicit class means both engines normalize the
    * same byte sequences. */
  val wsRunPat = "[ \\t\\n\\x0B\\f\\r]+"
  def normalizeWs(text: Column): Column =
    trim(regexp_replace(text, wsRunPat, " "))

  /** Mask PII with typed placeholders; emails first so the ip/phone
    * patterns never fire inside an already-masked span. */
  def maskPii(text: Column): Column = {
    val e = regexp_replace(text, emailPat, "<EMAIL>")
    val i = regexp_replace(e, ipv4Pat, "<IP>")
    regexp_replace(i, phonePat, "<PHONE>")
  }

  /** Per-document scrub report: PII counts (pre-scrub), the cleaned text,
    * and its length. */
  def scrub(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame =
    docs.select(
      col(idCol).as("id"),
      regexp_count(col(textCol), lit(emailPat)).as("n_emails"),
      regexp_count(col(textCol), lit(ipv4Pat)).as("n_ips"),
      regexp_count(col(textCol), lit(phonePat)).as("n_phones"),
      maskPii(normalizeWs(col(textCol))).as("clean_text"))
      .withColumn("clean_len", length(col("clean_text")))
}
