package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-level curation rules shared between the batch queries and the
  * streaming admission path — parity lives in one expression. */
object TextRules {

  /** URL canonicalization (the q115 / crawl-frontier rule): lowercase,
    * strip fragment, strip utm_* tracking params order-independently
    * (`?utm_x=1&page=2` and `?page=2&utm_x=1` converge), drop the
    * `www.` host prefix and an explicit `:443` default port (whether
    * followed by a path, a query, or end-of-authority), trim the
    * trailing slash. The utm strip is TWO rules so a literal `&` in a
    * path is never rewritten (the r11 review catch — a blanket
    * leading-`&`→`?` promotion corrupted `/a&b`): first a RUN of
    * leading utm params collapses onto its `?` (`\?(utm_…&)+` → `?`),
    * then any remaining `[?&]utm_…` (trailing, lone, or mid-query)
    * drops outright. Pure regexp chain — codegen'd, map-side, usable on
    * a streaming column; no lookarounds, so the Java and RE2 engines
    * agree. Mirrored verbatim by the q115 DuckDB oracle
    * (graft.queries.Curation). */
  def canonicalUrl(url: Column): Column =
    regexp_replace(regexp_replace(regexp_replace(regexp_replace(regexp_replace(
      regexp_replace(lower(url), "#.*$", ""),
      "\\?(utm_[a-z]+=[a-z0-9]*&)+", "?"),
      "[?&]utm_[a-z]+=[a-z0-9]*", ""),
      "://www\\.", "://"), ":443([/?]|$)", "$1"), "/$", "")

  /** PII regex classes (the q163 governance rule, shared verbatim with
    * the streaming admission path — [[graft.streaming.StreamIngest
    * .piiRedactStream]]): emails, NANP-style phone numbers, IPv4
    * addresses. No lookarounds, so the Java and RE2 engines agree. */
  val PiiEmail = "[a-z0-9.]+@[a-z0-9.]+\\.[a-z]{2,}"
  val PiiPhone = "[0-9]{3}-[0-9]{3}-[0-9]{4}"
  val PiiIp = "[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}"

  /** The masking chain: emails FIRST so a digit-bearing domain can never
    * double-count as an IP, then IPs, then phones. Pure codegen'd
    * regexp chain — map-side, stateless, streaming-safe. */
  def piiRedacted(text: Column): Column =
    regexp_replace(regexp_replace(regexp_replace(text,
      PiiEmail, "<EMAIL>"), PiiIp, "<IP>"), PiiPhone, "<PHONE>")

  /** The audit columns a governance log wants alongside the masked text
    * — per-class counts taken BEFORE masking, char sizes both sides.
    * One definition keyed off `text`, appended to any relation shape
    * (batch q163 and the stream project the same list). */
  def piiAuditCols(text: Column): Seq[Column] = Seq(
    regexp_count(text, lit(PiiEmail)).cast("long").as("n_emails"),
    regexp_count(text, lit(PiiPhone)).cast("long").as("n_phones"),
    regexp_count(text, lit(PiiIp)).cast("long").as("n_ips"),
    length(text).cast("long").as("n_chars_before"),
    piiRedacted(text).as("redacted"))
}
