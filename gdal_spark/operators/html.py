"""HTML → text extraction and line-level corpus dedup.

The two webtext front-door operators between a crawl container (WARC,
``gdal_spark.warc``) and the document-level pipeline (``web.py``,
``text.py``, ``dedup.py``):

* ``extract_text`` — from-spec HTML-to-text over a stdlib
  ``html.parser`` tokenizer (public Python, SGML-tolerant like real
  crawl HTML needs): drops script/style/head subtrees, breaks text at
  block-level tags, decodes character/entity references, collapses
  whitespace per block, and optionally drops navigation boilerplate by
  per-block LINK DENSITY (the classic text-to-tag heuristic used by
  jusText/trafilatura-class extractors).  Reference analog: the
  engine-side equivalent of the reference's per-feature translate loop
  feeding OGR fields from raw bytes (apps/ogr2ogr_lib.cpp:653); the
  semantics here are the public CommonCrawl WET extraction contract
  (one text line per HTML block element).
* ``line_dedup`` — CCNet-style line-level dedup: a line that occurs in
  ≥ ``min_docs`` distinct documents (after lowercase+trim
  normalization) is boilerplate and is removed from EVERY document
  (CCNet, Wenzek et al. 2020 §3.1 dedups paragraph hashes the same
  way).  Returns the documents re-assembled with original line order.

Scale notes
-----------
* ``extract_text`` is one ``mapInPandas`` projection: no shuffle; the
  parse is CPU-bounded per document and embarrassingly parallel.  Pair
  with ``warc.read_warc`` for the end-to-end crawl→text path.
* ``line_dedup`` shuffles (a) 8-byte line hashes for the frequency
  aggregation — map-side combine makes the hot boilerplate lines cheap
  (they collapse to one partial row per partition, exactly the skew
  the operator targets) — and (b) surviving (doc, pos, line) rows for
  the re-assembly groupBy.  Text travels through ONE shuffle; the
  frequency side ships only hashes.  The boilerplate-hash set is NOT
  collected or broadcast: it is a shuffle join on the hash, so a 100TB
  corpus with billions of distinct lines never touches the driver.
"""

from __future__ import annotations

from html.parser import HTMLParser

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# tags whose content never contributes text
_SKIP_SUBTREE = {"script", "style", "noscript", "template", "svg", "head"}
# tags that terminate the current text block (HTML5 flow content +
# table/list structure); everything else is inline
_BLOCK = {
    "address", "article", "aside", "blockquote", "body", "br",
    "caption", "dd", "div", "dl", "dt", "fieldset", "figcaption",
    "figure", "footer", "form", "h1", "h2", "h3", "h4", "h5", "h6",
    "header", "hr", "html", "li", "main", "nav", "ol", "option", "p",
    "pre", "section", "select", "table", "tbody", "td", "tfoot", "th",
    "thead", "tr", "ul",
}
# void elements never appear on the end-tag stack
_VOID = {"br", "hr", "img", "input", "meta", "link", "area", "base",
         "col", "embed", "source", "track", "wbr"}


class _TextExtractor(HTMLParser):
    """One-pass tokenizer → list of (block_text, link_chars, chars).

    ``convert_charrefs=True`` (the stdlib default) decodes &amp;-style
    references before ``handle_data`` sees them, so entity handling is
    spec-complete for free.
    """

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.blocks: list[tuple[str, int, int]] = []
        self.title = ""
        self._parts: list[str] = []
        self._link_chars = 0
        self._chars = 0
        self._skip = 0          # depth inside skip subtrees
        self._in_title = False
        self._link_depth = 0

    def _flush(self) -> None:
        text = " ".join("".join(self._parts).split())
        if text:
            self.blocks.append((text, self._link_chars, self._chars))
        self._parts = []
        self._link_chars = 0
        self._chars = 0

    def handle_starttag(self, tag, attrs):
        if tag in _SKIP_SUBTREE and tag != "head":
            self._skip += 1
            return
        if tag == "head":
            self._skip += 1  # head text (meta/title) is not body text
        if tag == "title":
            self._in_title = True
        if tag == "a":
            self._link_depth += 1
        if tag in _BLOCK:
            self._flush()

    def handle_endtag(self, tag):
        if tag in _SKIP_SUBTREE and tag != "head":
            self._skip = max(0, self._skip - 1)
            return
        if tag == "head":
            self._skip = max(0, self._skip - 1)
        if tag == "title":
            self._in_title = False
        if tag == "a":
            self._link_depth = max(0, self._link_depth - 1)
        if tag in _BLOCK and tag not in _VOID:
            self._flush()

    def handle_data(self, data):
        if self._in_title:
            self.title += data
            return
        if self._skip:
            return
        self._parts.append(data)
        n = len("".join(data.split()))
        self._chars += n
        if self._link_depth:
            self._link_chars += n

    def close(self):
        super().close()
        self._flush()


def extract_html(html: str, max_link_density: float | None = None
                 ) -> tuple[str, str, int, int]:
    """→ (text, title, n_blocks, n_dropped).  Blocks join with \\n."""
    p = _TextExtractor()
    try:
        p.feed(html)
        p.close()
    except Exception:
        # crawl HTML is adversarial; a parser error yields empty text
        # rather than a failed task (the reference's CPLError-and-skip
        # convention for broken features)
        return "", "", 0, 0
    kept, dropped = [], 0
    for text, link_chars, chars in p.blocks:
        if (
            max_link_density is not None
            and chars > 0
            and link_chars / chars >= max_link_density
        ):
            dropped += 1
            continue
        kept.append(text)
    title = " ".join(p.title.split())
    return "\n".join(kept), title, len(kept), dropped


def extract_text(
    df: DataFrame,
    html_col: str = "html",
    id_col: str = "doc_id",
    max_link_density: float | None = None,
) -> DataFrame:
    """→ (id, text, title, n_blocks, n_dropped_blocks) per document.

    One mapInPandas projection (no shuffle); ``max_link_density``
    drops blocks whose visible characters are ≥ that fraction inside
    <a> — the standard nav/boilerplate heuristic."""
    schema = T.StructType(
        [
            df.schema[id_col],
            T.StructField("text", T.StringType()),
            T.StructField("title", T.StringType()),
            T.StructField("n_blocks", T.IntegerType()),
            T.StructField("n_dropped_blocks", T.IntegerType()),
        ]
    )

    def run(batches):
        for pdf in batches:
            rows = [
                extract_html(h if isinstance(h, str) else "",
                             max_link_density)
                for h in pdf[html_col].tolist()
            ]
            out = pd.DataFrame(
                rows, columns=["text", "title", "n_blocks",
                               "n_dropped_blocks"]
            )
            out.insert(0, id_col, pdf[id_col].to_numpy())
            yield out

    return df.select(id_col, html_col).mapInPandas(run, schema)


def line_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_docs: int = 2,
    normalize: bool = True,
) -> DataFrame:
    """Remove every line that occurs in ≥ ``min_docs`` distinct
    documents; → (id, text, n_lines_kept, n_lines_dropped).

    All JVM: split/posexplode → hash-count distinct docs per
    normalized line → anti-join style filter → ordered re-assembly.
    Documents whose every line is boilerplate survive with text ''.
    """
    line = F.col("__line")
    norm = F.trim(F.lower(line)) if normalize else line
    lines = (
        df.select(id_col, F.posexplode(F.split(F.col(text_col), "\n"))
                  .alias("__pos", "__line"))
        .withColumn("__h", F.xxhash64(norm))
    )
    # distinct doc count per line hash: two-level agg so the combine
    # happens map-side on (hash, doc) before the distinct count
    freq = (
        lines.select("__h", id_col).distinct()
        .groupBy("__h").agg(F.count(F.lit(1)).alias("__docs"))
    )
    common = freq.filter(F.col("__docs") >= min_docs).select(
        "__h", F.lit(True).alias("__common")
    )
    tagged = lines.join(common, "__h", "left")
    kept = F.col("__common").isNull()
    out = (
        tagged.groupBy(id_col)
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(kept,
                                   F.struct("__pos", "__line"))
                        )
                    ),
                    lambda s: s["__line"],
                ),
                "\n",
            ).alias(text_col),
            F.sum(kept.cast("int")).alias("n_lines_kept"),
            F.sum((~kept).cast("int")).alias("n_lines_dropped"),
        )
    )
    return out
