package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL extraction and canonicalization — the URL-dedup primitive of a
  * crawl pipeline: the same page arrives as `HTTP://Example.COM:80/a`,
  * `http://example.com/a?utm_source=feed`, and `http://example.com/a#top`,
  * and dedup-by-URL only works after those collapse to one canonical
  * form. Every step is a regex/string projection (row-local, codegen'd,
  * no parser object per row) chosen to be replayable in a SQL oracle:
  * scheme+authority case-fold (path case is SIGNIFICANT and preserved),
  * default :80/:443 stripped only for the matching scheme, tracking
  * parameters (utm_*, fbclid, gclid) removed wherever they sit in the
  * query string, fragments dropped.
  */
object Urls {

  /** Absolute http(s) URLs in running text (scheme matched
    * case-insensitively — crawls deliver `HTTP://` too).
    */
  val UrlPattern = "(?i:https?)://[^\\s]+"

  /** All URL occurrences in a text column (array). */
  def extract(c: Column): Column =
    regexp_extract_all(c, lit(UrlPattern), lit(0))

  /** Canonical form of a URL column. Steps, in order:
    * 1. drop the fragment;
    * 2. drop tracking params keeping their leading separator, collapse
    *    the separator runs a removal leaves (`?&`/`&&` → one), strip a
    *    dangling trailing separator;
    * 3. lowercase scheme + authority (up to the first `/`, `?` or `#`),
    *    leaving path/query bytes untouched;
    * 4. strip `:80` for http and `:443` for https.
    */
  def canonicalize(u: Column): Column = {
    val noFrag = regexp_replace(u, "#.*$", "")
    val noTrack = regexp_replace(noFrag,
      "([?&])(?:utm_[A-Za-z]+|fbclid|gclid)=[^&#]*", "$1")
    val cleaned = regexp_replace(
      regexp_replace(noTrack, "([?&])&+", "$1"), "[?&]+$", "")
    val head = regexp_extract(cleaned, "^((?i:https?)://[^/?#]+)", 1)
    val tail = cleaned.substr(length(head) + 1, length(cleaned))
    val lowHead = regexp_replace(
      regexp_replace(lower(head), "^(http://[^/:]+):80$", "$1"),
      "^(https://[^/:]+):443$", "$1")
    concat(lowHead, tail)
  }
}
