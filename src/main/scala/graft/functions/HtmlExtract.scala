package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Boilerplate-stripping main-text extraction from raw HTML (trafilatura/
  * jusText-lite) — the first stage of every web-crawl LLM corpus pipeline.
  * The reference corpus arrives as clean text, so the contract query PLANTS
  * deterministic HTML around each document (the `fix_mojibake`
  * corruption-inverse discipline) and the DuckDB oracle replays the rules
  * declaratively over the raw text; the expression itself handles arbitrary
  * real-world markup (fixture-pinned in NativeExprParitySpec).
  *
  * One pass over the chars, zero regex:
  *
  *  1. MARKUP. `<` starts markup only when followed by `/`, `!`, `?` or an
  *     ASCII letter (a bare `a < b` stays text). Comments `<!-- -->`,
  *     doctype `<! >` and PIs `<? >` are skipped whole; `<script>` and
  *     `<style>` are raw-text elements — their CONTENT is skipped up to the
  *     case-insensitive closing tag; attribute lists are skipped
  *     quote-aware (a `>` inside a quoted attribute does not end the tag).
  *  2. BLOCK SEGMENTATION. Any open/close/self-close of a block-level tag
  *     (p, div, h1-h6, li, ul/ol, table/tr/td/th, br, hr, pre, blockquote,
  *     article/section/main, nav/header/footer/aside/form, html/head/body/
  *     title, dl/dt/dd, figure/figcaption, thead/tbody) finalizes the
  *     current text block. Inline tags (a, b, i, em, span, …) do not.
  *  3. TEXT. Entities are decoded (named amp/lt/gt/quot/apos/nbsp + numeric
  *     dec/hex; anything else stays literal), whitespace runs collapse to
  *     one space, blocks are trimmed. A WORD is a maximal non-whitespace
  *     run; a word is a LINK word when it starts inside an `<a>` element
  *     (U+00A0 from `&nbsp;` is NOT whitespace — it glues words, the reason
  *     boilerplate uses it).
  *  4. KEEP RULE (per non-empty block): kept iff it is outside every drop
  *     container (head, nav, header, footer, aside, form), has ≥ 2 words,
  *     and link words are ≤ half its words (integer test
  *     `2·linkWords ≤ words` — no float threshold, per the rational-
  *     boundary rule). Kept block texts join with '\n'; empty/whitespace
  *     blocks count as neither kept nor dropped.
  *
  * Scale shape: a scalar expression — no shuffle, no state; runs inside the
  * scan projection at whatever parallelism the corpus scan has. Cost is one
  * linear pass per document (the StringBuilder is the only allocation).
  */
case class HtmlExtractExpr(child: Expression)
    extends UnaryExpression with CodegenFallback
    with org.apache.spark.sql.catalyst.expressions.ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = StructType(Seq(
    StructField("text", StringType, nullable = false),
    StructField("n_kept", IntegerType, nullable = false),
    StructField("n_dropped", IntegerType, nullable = false)))

  override def nullSafeEval(input: Any): Any = {
    val r = HtmlExtractExpr.extract(input.asInstanceOf[UTF8String].toString)
    new GenericInternalRow(Array[Any](
      UTF8String.fromString(r.text), r.kept, r.dropped))
  }
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

object HtmlExtractExpr {
  final case class Extracted(text: String, kept: Int, dropped: Int)

  /** Tags that end the current text block when opened OR closed. */
  private val BlockTags: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String]()
    Seq("html", "head", "body", "title", "p", "div",
        "h1", "h2", "h3", "h4", "h5", "h6",
        "ul", "ol", "li", "dl", "dt", "dd",
        "table", "thead", "tbody", "tr", "td", "th",
        "blockquote", "pre", "br", "hr",
        "article", "section", "main", "figure", "figcaption",
        "nav", "header", "footer", "aside", "form").foreach(s.add)
    s
  }
  /** Structural boilerplate containers: everything inside is dropped. */
  private val DropContainers: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String]()
    Seq("head", "nav", "header", "footer", "aside", "form").foreach(s.add)
    s
  }

  private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\r' || c == '\f'
  private def isAsciiLetter(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z')

  /** The whole extraction, pure — shared by the expression, the operator's
    * docs, and the spec's independent regex reference. */
  def extract(html: String): Extracted = {
    val n = html.length
    val out = new java.lang.StringBuilder
    val block = new java.lang.StringBuilder
    var kept = 0; var dropped = 0
    var dropDepth = 0           // nesting inside DropContainers
    var linkDepth = 0           // nesting inside <a>
    var blockWords = 0; var blockLinkWords = 0
    var inWord = false; var pendingSpace = false

    def flushBlock(): Unit = {
      if (block.length() > 0) {
        val keep = dropDepth == 0 && blockWords >= 2 &&
          2 * blockLinkWords <= blockWords
        if (keep) {
          if (out.length() > 0) out.append('\n')
          out.append(block)
          kept += 1
        } else dropped += 1
      }
      block.setLength(0); blockWords = 0; blockLinkWords = 0
      inWord = false; pendingSpace = false
    }

    def appendChar(c: Char): Unit = {
      if (isWs(c)) { inWord = false; pendingSpace = block.length() > 0 }
      else {
        if (!inWord) {
          if (pendingSpace) { block.append(' '); pendingSpace = false }
          inWord = true
          blockWords += 1
          if (linkDepth > 0) blockLinkWords += 1
        }
        block.append(c)
      }
    }

    def appendCodePoint(cp: Int): Unit =
      if (cp <= 0xFFFF) appendChar(cp.toChar)
      else { // supplementary: the pair is one word-char, not two words
        appendChar(Character.highSurrogate(cp))
        block.append(Character.lowSurrogate(cp))
      }

    /** Case-insensitive search for `</name` starting at `from`; returns the
      * index AFTER the closing '>' (or n). Raw-text elements. */
    def skipRawText(from: Int, name: String): Int = {
      var i = from
      while (i < n) {
        if (html.charAt(i) == '<' && i + 1 < n && html.charAt(i + 1) == '/') {
          var j = i + 2; var k = 0
          while (j < n && k < name.length &&
                 Character.toLowerCase(html.charAt(j)) == name.charAt(k)) {
            j += 1; k += 1
          }
          if (k == name.length) {
            while (j < n && html.charAt(j) != '>') j += 1
            return if (j < n) j + 1 else n
          }
        }
        i += 1
      }
      n
    }

    var i = 0
    while (i < n) {
      val c = html.charAt(i)
      if (c == '<' && i + 1 < n &&
          (html.charAt(i + 1) == '/' || html.charAt(i + 1) == '!' ||
           html.charAt(i + 1) == '?' || isAsciiLetter(html.charAt(i + 1)))) {
        if (html.startsWith("<!--", i)) { // comment — content vanishes
          val e = html.indexOf("-->", i + 4)
          i = if (e < 0) n else e + 3
        } else if (html.charAt(i + 1) == '!' || html.charAt(i + 1) == '?') {
          val e = html.indexOf('>', i + 1) // doctype / PI
          i = if (e < 0) n else e + 1
        } else {
          var j = i + 1
          val closing = html.charAt(j) == '/'
          if (closing) j += 1
          val nameStart = j
          while (j < n && (isAsciiLetter(html.charAt(j)) ||
                 (html.charAt(j) >= '0' && html.charAt(j) <= '9'))) j += 1
          val name = html.substring(nameStart, j).toLowerCase
          // attributes, quote-aware: '>' inside '…' or "…" is literal
          var quote: Char = 0
          var lastNonWs: Char = 0
          while (j < n && (quote != 0 || html.charAt(j) != '>')) {
            val a = html.charAt(j)
            if (quote != 0) { if (a == quote) quote = 0 }
            else if (a == '"' || a == '\'') quote = a
            if (!isWs(a)) lastNonWs = a
            j += 1
          }
          val selfClosing = !closing && lastNonWs == '/'
          i = if (j < n) j + 1 else n
          if (!closing && !selfClosing && (name == "script" || name == "style"))
            i = skipRawText(i, name)
          if (BlockTags.contains(name)) {
            flushBlock()
            if (DropContainers.contains(name) && !selfClosing) {
              if (closing) { if (dropDepth > 0) dropDepth -= 1 }
              else dropDepth += 1
            }
          }
          if (name == "a" && !selfClosing) {
            if (closing) { if (linkDepth > 0) linkDepth -= 1 }
            else linkDepth += 1
          }
        }
      } else if (c == '&') {
        // entity: longest-match up to ';' within a small window
        var j = i + 1
        var cp = -1
        if (j < n && html.charAt(j) == '#') {
          j += 1
          var v = 0L; var digits = 0
          if (j < n && (html.charAt(j) == 'x' || html.charAt(j) == 'X')) {
            j += 1
            while (j < n && digits < 7 && Character.digit(html.charAt(j), 16) >= 0) {
              v = v * 16 + Character.digit(html.charAt(j), 16); j += 1; digits += 1
            }
          } else {
            while (j < n && digits < 8 && html.charAt(j) >= '0' && html.charAt(j) <= '9') {
              v = v * 10 + (html.charAt(j) - '0'); j += 1; digits += 1
            }
          }
          if (digits > 0 && j < n && html.charAt(j) == ';' &&
              v > 0 && v <= 0x10FFFF && !(v >= 0xD800 && v <= 0xDFFF))
            cp = v.toInt
        } else {
          val semi = {
            var k = j; var found = -1
            while (k < n && k < j + 8 && found < 0) {
              if (html.charAt(k) == ';') found = k; k += 1
            }
            found
          }
          if (semi > j) {
            html.substring(j, semi) match {
              case "amp"  => cp = '&'
              case "lt"   => cp = '<'
              case "gt"   => cp = '>'
              case "quot" => cp = '"'
              case "apos" => cp = '\''
              case "nbsp" => cp = 0xA0
              case _      => // unknown entity: leave the '&' literal
            }
            if (cp >= 0) j = semi
          }
        }
        if (cp >= 0) { appendCodePoint(cp); i = j + 1 }
        else { appendChar('&'); i += 1 }
      } else {
        appendChar(c)
        i += 1
      }
    }
    flushBlock()
    Extracted(out.toString, kept, dropped)
  }
}
