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
}
