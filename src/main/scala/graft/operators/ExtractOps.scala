package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * HTML → text extraction — the FIRST stage of every real crawl
 * pipeline (the trafilatura/jusText step) that must run before any of
 * the curation gates can see clean text. Deterministic and rule-based,
 * so it is oracle-gateable: [[withHtmlPayload]] synthesizes a full
 * page around each document's text (head/title/style/script, a
 * link-only nav, the body dealt into `<p>` paragraphs with entities
 * escaped, a link-heavy footer), and [[htmlExtract]] recovers exactly
 * the whitespace-normalized document text from it — the same
 * synthesize-then-recover pattern as the PNG/WAV multimodal gates.
 *
 * Extraction algorithm (jusText-style, simplified to stay
 * deterministic):
 *  1. drop non-content machinery wholesale: `<head>…</head>`,
 *     `<script>…</script>`, `<style>…</style>`, comments;
 *  2. split what remains into candidate blocks at block-level tag
 *     boundaries (p/div/li/nav/footer/h1-6/…);
 *  3. per block, measure LINK DENSITY — the fraction of the block's
 *     visible characters that live inside `<a>` anchors — and drop
 *     blocks that are majority-link (navigation chrome, footers,
 *     related-article rails) or empty;
 *  4. strip inline tags from surviving blocks, unescape entities,
 *     normalize whitespace, join in document order.
 *
 * Everything is pure `Column` expressions (codegen'd regex/HOFs over
 * one row at a time — a narrow map, no shuffle, no UDF), so the
 * operator runs at scan speed and composes with every downstream
 * curation op at 100 TB.
 */
object ExtractOps {

  /** Block-level tag boundary — opening or closing. */
  private val BlockTags =
    "(?i)</?(?:p|div|ul|ol|li|nav|footer|header|article|section|aside|" +
      "main|h[1-6]|br|table|thead|tbody|tr|td|th|blockquote|figure)[^>]*>"

  /** Escape the three HTML-significant characters (synthesis side). */
  private def esc(c: Column): Column =
    regexp_replace(regexp_replace(regexp_replace(c,
      lit("&"), lit("&amp;")),
      lit("<"), lit("&lt;")),
      lit(">"), lit("&gt;"))

  /** Unescape — exact inverse order of [[esc]]. */
  private def unesc(c: Column): Column =
    regexp_replace(regexp_replace(regexp_replace(c,
      lit("&lt;"), lit("<")),
      lit("&gt;"), lit(">")),
      lit("&amp;"), lit("&"))

  /** Visible text of an HTML fragment: tags → space, whitespace
    * normalized. */
  private def visible(s: Column): Column =
    trim(regexp_replace(regexp_replace(s,
      lit("<[^>]*>"), lit(" ")),
      lit("\\s+"), lit(" ")))

  /** Visible text living inside `<a>` anchors of a fragment. */
  private def anchorText(s: Column): Column =
    visible(array_join(
      regexp_extract_all(s, lit("(?is)<a\\s[^>]*>(.*?)</a>"), lit(1)),
      " "))

  /**
   * Synthesize a deterministic full HTML page per document: title +
   * style + script in the head, a 3-link nav, the document text dealt
   * into 20-word `<p>` paragraphs (entity-escaped), and a
   * majority-link footer. Construction is a pure function of
   * `(idCol, textCol)`, so an oracle can state exactly what
   * extraction must return. Adds an `html` column.
   */
  def withHtmlPayload(df: DataFrame, idCol: String = "doc_id",
                      textCol: String = "text"): DataFrame = {
    val words = split(trim(col(textCol)), " ")
    val nChunks =
      greatest(ceil(size(words).cast("double") / 20.0).cast("int"), lit(1))
    val paras = array_join(transform(sequence(lit(0), nChunks - 1),
      i => concat(lit("<p>"),
        esc(array_join(slice(words, i * 20 + 1, lit(20)), " ")),
        lit("</p>"))), "")
    val navLinks = array_join(transform(sequence(lit(0), lit(2)),
      i => concat(lit("<li><a href=\"/cat/"),
        ((col(idCol) + i) % 50).cast("string"),
        lit("\">section"), ((col(idCol) + i) % 50).cast("string"),
        lit("</a></li>"))), "")
    df.withColumn("html", concat(
      lit("<html><head><title>Document "), col(idCol).cast("string"),
      lit("</title><style>body{margin:0;font:14px sans-serif}</style>" +
        "<script>var id="), col(idCol).cast("string"),
      lit(";track(id);</script></head><body><nav><ul>"), navLinks,
      lit("</ul></nav><article>"), paras,
      lit("</article><footer><a href=\"/about\">About</a> " +
        "<a href=\"/terms\">Terms</a> <a href=\"/privacy\">Privacy</a> " +
        "&#169; 2024</footer></body></html>")))
  }

  /**
   * Rule-based boilerplate-removing extraction (see object doc).
   * Output: `(idCol, extracted, blocks_kept, blocks_dropped)` —
   * `extracted` is the whitespace-normalized, entity-unescaped
   * content text in document order.
   */
  def htmlExtract(df: DataFrame, idCol: String = "doc_id",
                  htmlCol: String = "html"): DataFrame = {
    val pre = regexp_replace(regexp_replace(regexp_replace(regexp_replace(
      col(htmlCol),
      lit("(?is)<head[^>]*>.*?</head>"), lit(" ")),
      lit("(?is)<script[^>]*>.*?</script>"), lit(" ")),
      lit("(?is)<style[^>]*>.*?</style>"), lit(" ")),
      lit("(?s)<!--.*?-->"), lit(" "))
    val segs = split(pre, BlockTags)
    // majority-link or empty blocks are boilerplate; everything else
    // is content (the jusText link-density heuristic)
    val kept = filter(segs, s =>
      length(visible(s)) > 0 &&
        length(anchorText(s)) * 2 <= length(visible(s)))
    val joined = array_join(transform(kept, s => visible(s)), " ")
    df.select(col(idCol),
      trim(regexp_replace(unesc(joined), lit("\\s+"), lit(" ")))
        .as("extracted"),
      size(kept).as("blocks_kept"),
      (size(segs) - size(kept)).as("blocks_dropped"))
  }
}
