package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** HTML → text extraction: the first stage of a web-crawl training-data
  * pipeline (WARC/HTML in, clean text out). The reference engine has no
  * HTML stage — this is a scale extension in the same family as the
  * other document-curation operators.
  *
  * Everything here is a chain of built-in string/regexp expressions:
  * row-local, whole-stage-codegen'd, zero shuffle — the shape that
  * survives a 100 TB crawl unchanged. The extraction is regex-grade
  * (tags/comments/entities/boilerplate-blocks), deliberately NOT a
  * spec-complete DOM parse: for corpus curation the quality signals
  * (link density, text ratio) matter more than perfect fidelity, and
  * every transform is replayable as ANSI SQL for the oracle.
  */
object Html {

  /** `<head>` (title/meta/style live there — metadata, not prose),
    * `<script>`/`<style>`/`<noscript>`/`<template>` blocks and HTML
    * comments — content that must be DROPPED, not just untagged.
    * `<head\b` does not match `<header>` (no word boundary before 'e').
    */
  private val dropBlocks = Seq(
    "(?is)<head\\b[^>]*>.*?</head>",
    "(?is)<script\\b[^>]*>.*?</script>",
    "(?is)<style\\b[^>]*>.*?</style>",
    "(?is)<noscript\\b[^>]*>.*?</noscript>",
    "(?is)<template\\b[^>]*>.*?</template>",
    "(?s)<!--.*?-->")

  /** Block-level tags — OPENERS AND CLOSERS — that imply a text break,
    * replaced with a newline so words from adjacent blocks never fuse.
    * Openers matter for implied-closer markup (`<p>one<p>two` is valid
    * HTML) and table cells (`<td>Price</td><td>100</td>` must not read
    * 'Price100'). Every alternative takes attributes (`<br class=..>`
    * must break like bare `<br>`); `\b` after the name keeps `<pre`
    * from matching `<preview>`.
    */
  private val blockBreak =
    "(?i)</?(?:br|p|div|h[1-6]|li|tr|td|th|dt|dd|table|ul|ol|blockquote|section|article|header|footer|pre)\\b[^>]*>"

  /** Minimal entity set (the ones HTML serializers actually emit for
    * text); numeric entities beyond `&#39;` are left as-is — rare in
    * prose, and a partial decode is worse than a visible artifact.
    */
  private def decodeEntities(c: Column): Column = {
    val amp = regexp_replace(
      regexp_replace(
        regexp_replace(
          regexp_replace(
            regexp_replace(c, "&lt;", "<"),
            "&gt;", ">"),
          "&quot;", "\""),
        "&#39;", "'"),
      "&nbsp;", " ")
    // &amp; LAST: decoding it first would re-activate entities it escaped
    regexp_replace(amp, "&amp;", "&")
  }

  /** Dropped-block removal only — the shared first stage: what remains
    * is the page's VISIBLE markup (anchors included), which is the
    * right base both for text extraction and for boilerplate signals
    * like [[anchorChars]] (counting anchors inside a dropped script or
    * comment would misweight the page).
    */
  private def dropInvisible(html: Column): Column =
    dropBlocks.foldLeft(html)((c, p) => regexp_replace(c, p, ""))

  /** The shared strip chain after block-dropping: block tags to
    * newlines, remaining tags removed, entities decoded. Both extract
    * variants differ only in the final whitespace normalization.
    */
  private def strippedDecoded(html: Column): Column =
    decodeEntities(
      regexp_replace(
        regexp_replace(dropInvisible(html), blockBreak, "\n"),
        "(?s)<[^>]*>", ""))

  /** Strip an HTML fragment to whitespace-normalized text: drop
    * script/style/comment blocks, break on block boundaries, remove
    * remaining tags, decode entities, collapse whitespace.
    */
  def extractText(html: Column): Column =
    trim(regexp_replace(strippedDecoded(html), "\\s+", " "))

  /** [[extractText]] but PRESERVING line structure: block breaks become
    * single newlines instead of dissolving into the whitespace collapse
    * — the form the C4 line filter ([[TextOps.c4LineClean]]) needs
    * downstream. Horizontal runs collapse to one space, newline runs
    * (with surrounding spaces) to one newline, ends trimmed.
    */
  def extractLines(html: Column): Column =
    // regexp end-trim, not trim(): Spark's trim strips SPACES only, and
    // the final block tag always leaves a trailing newline behind
    regexp_replace(
      regexp_replace(
        regexp_replace(strippedDecoded(html), "[^\\S\\n]+", " "),
        " ?\\n[ \\n]*", "\n"),
      "^\\s+|\\s+$", "")

  /** `<title>` content (entity-decoded, whitespace-collapsed); empty
    * string when absent. Reads the RAW html — the title lives inside
    * the `<head>` block the text path drops.
    */
  def title(html: Column): Column =
    trim(regexp_replace(
      decodeEntities(regexp_extract(html, "(?is)<title[^>]*>(.*?)</title>", 1)),
      "\\s+", " "))

  /** Total characters of anchor-enclosed text (tags inside the anchor
    * stripped, entities DECODED — the extracted-text denominator is
    * decoded, so an undecoded numerator would overcount entity-heavy
    * chrome and break the [0,1] ratio) — the numerator of link
    * density. Anchors are extracted AFTER the invisible blocks are
    * dropped: an `<a>` inside a script string or comment is not a
    * rendered link and must not count. Sums over
    * `regexp_extract_all`, so a page with no links is 0.
    */
  def anchorChars(html: Column): Column =
    coalesce(
      aggregate(
        regexp_extract_all(dropInvisible(html),
          lit("(?is)<a\\b[^>]*>(.*?)</a>"), lit(1)),
        lit(0L),
        (acc, a) => acc + length(trim(regexp_replace(
          decodeEntities(regexp_replace(a, "(?s)<[^>]*>", "")),
          "\\s+", " ")))),
      lit(0L))

  /** Link density = anchor-text chars / max(1, extracted-text chars).
    * The classic boilerplate signal: navigation/footer chrome is
    * link-dense, article prose is not. Both sides of the ratio now
    * derive from the same visible markup, so the value stays in [0, 1]
    * (anchor text IS part of the extracted text).
    */
  def linkDensity(html: Column): Column = {
    val total = greatest(length(extractText(html)).cast("long"), lit(1L))
    anchorChars(html).cast("double") / total.cast("double")
  }

  /** Extracted-text chars / max(1, raw-html chars): markup-heavy pages
    * (trackers, hidden markup, tag soup) score near 0, text pages near
    * their prose fraction. A cheap pre-filter before heavier scoring.
    */
  def textRatio(html: Column): Column =
    length(extractText(html)).cast("double") /
      greatest(length(html).cast("long"), lit(1L)).cast("double")
}
