"""PDF layout analysis: margins + font-style histograms -> heading
classification — the Spark counterpart of the reference PDFAnalyzer
(reference: ferenda/pdfanalyze.py:99-390, tested by
test/testPDFAnalyze.py).

Input contract is a columnar BOXES table (one row per glued textbox)
plus a PAGES table:

    boxes: doc_id string, page int, left int, top int, right int,
           bottom int, nchars int (len of the stripped text),
           family string, size int
    pages: doc_id string, page int, width int, height int

Ingest: :func:`parse_pdf2xml` parses poppler ``pdftohtml -xml``
output (the reference's own PDF intermediate — test fixture
lipsum.xml) into box rows with the reference reader's exact textbox
semantics: empty-box skip, footnote-superscript gluing and
post-footnote continuation merge (reference: ferenda/pdfreader.py:
577-631), whitespace normalization (pdfreader.py:479-480) and
subset-prefix font-family stripping (pdfreader.py:569-570).
:func:`boxes_from_xml_df` maps the parser over a (doc_id, xml)
DataFrame via mapInPandas — at 100 TB this is the classic
one-task-per-document embarrassingly parallel stage; everything
downstream is groupBy/window aggregation keyed on doc_id (ONE shuffle
family), never a driver-side loop.

Analysis semantics (reference: pdfanalyze.py:260-390):

* header/footer zone: cumulative char-count scan from the page top
  (resp. bottom) until ``threshold * total_chars`` is exceeded —
  expressed as a window cumulative sum over the per-position
  histogram (topmargin = first exceeding top - 1; bottommargin =
  first exceeding bottom + 1, scanning down from ``max(pageheight)-1``
  so a bottom at exactly the page height is out of range, like the
  reference's ``range(max-1, -1, -1)``).
* left margin: mode of box left edges left of midpage (odd pages when
  ``twopage``), where midpage = most-common page width / 2.
* right margin: right edges right of midpage, quantized into
  ceil-bins of 10 (reference findmargin(quantize=True), binsize 10,
  pdfanalyze.py:317-352); the LARGEST bin among those tied at the top
  count.
* styles: char-weighted (family, size) histogram; default = the most
  used; h1-h3 = the up-to-three styles strictly larger than default
  by the (size, bold>italic>regular weight) key with use above
  ``style_significance * total`` (pdfanalyze.py:356-390).

Tie-breaks: the reference inherits Counter insertion order for exact
ties; this engine uses deterministic orderings (documented at each
window) — identical results whenever counts are distinct, which the
reference's own fixture satisfies.
"""

from __future__ import annotations

import re
from typing import Iterator
from xml.etree import ElementTree

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

BOX_SCHEMA = ("doc_id string, page int, left int, top int, "
              "right int, bottom int, nchars int, family string, "
              "size int, text string")
PAGE_SCHEMA = "doc_id string, page int, width int, height int"

_WS_RE = re.compile(r"[\s\xa0\xc2]+")


def _txt(s) -> str:
    """Reference pdfreader.py:479-480 whitespace normalization."""
    return _WS_RE.sub(" ", str(s))


def _element_parts(element) -> list[str]:
    """The Textelement texts of one <text> element, in the reference
    reader's append order (pdfreader.py:632-680: plain text, <a> with
    nested <b>/<i>, the <i><b> construct, tails)."""
    parts = []
    if element.text and element.text.strip():
        parts.append(_txt(element.text))
    for child in element:
        if child.tag == "a":
            text = child.text
            grandchildren = list(child)
            if grandchildren:
                text = grandchildren[0].text
            parts.append(_txt(text))
        else:
            grandchildren = list(child)
            if grandchildren:
                if child.text:
                    parts.append(_txt(child.text))
                parts.append(_txt(" ".join(
                    x.text or "" for x in grandchildren)))
                if grandchildren[0].tail:
                    parts.append(_txt(grandchildren[0].tail))
                if child.tail:
                    parts.append(_txt(child.tail))
            else:
                parts.append(_txt(child.text))
                if child.tail:
                    parts.append(_txt(child.tail))
    if element.tail and element.tail.strip():
        parts.append(_txt(element.tail))
    return parts


def parse_pdf2xml(data: bytes, doc_id: str = "") -> tuple[list[dict],
                                                          list[dict]]:
    """Parse poppler ``pdftohtml -xml`` output into (pages, boxes) row
    dicts with the reference reader's textbox semantics (see module
    docstring).  Pure function — runs driver-side for fixtures/tests
    and inside mapInPandas for distributed ingest."""
    root = ElementTree.fromstring(data)
    if root.tag != "pdf2xml":
        raise ValueError(f"unexpected root <{root.tag}>, want <pdf2xml>")
    fontspec: dict[int, tuple[str, int]] = {}
    pages: list[dict] = []
    boxes: list[dict] = []
    for pageelement in root:
        if pageelement.tag != "page":
            continue  # <outline> etc.
        pageno = int(pageelement.attrib["number"])
        pages.append({"doc_id": doc_id, "page": pageno,
                      "width": int(pageelement.attrib["width"]),
                      "height": int(pageelement.attrib["height"])})
        pageboxes: list[dict] = []
        after_footnote = False
        for element in pageelement:
            if element.tag == "fontspec":
                family = element.attrib["family"]
                if "+" in family:  # strip the subset tag (ABCDEE+...)
                    family = family.split("+", 1)[1]
                fontspec[int(element.attrib["id"])] = (
                    family, int(element.attrib["size"]))
                continue
            if element.tag != "text":
                continue
            if (element.text and _txt(element.text).strip() == ""
                    and not list(element)):
                continue  # "empty" textbox (pdfreader.py:578-582)
            a = element.attrib
            left, top = int(a["left"]), int(a["top"])
            width, height = int(a["width"]), int(a["height"])
            family, size = fontspec[int(a["font"])]
            if pageboxes:
                prev = pageboxes[-1]
                # footnote-marker glue (pdfreader.py:595-611): a
                # digit-only run in the same family at a SMALLER size
                # flush against the previous box merges as "sup"
                if (prev["family"] == family and prev["size"] > size
                        and prev["right"] == left and element.text
                        and element.text.isdigit()):
                    prev["parts"].append(str(element.text))
                    prev["right"] = left + width
                    after_footnote = True
                    continue
                # post-footnote continuation (pdfreader.py:613-625)
                if (after_footnote and prev["family"] == family
                        and prev["size"] == size
                        and prev["top"] == top
                        and prev["bottom"] - prev["top"] == height
                        and prev["right"] == left):
                    prev["parts"].append(element.text or "")
                    prev["right"] = left + width
                    after_footnote = False
                    continue
                after_footnote = False
            pageboxes.append({
                "doc_id": doc_id, "page": pageno, "left": left,
                "top": top, "right": left + width,
                "bottom": top + height, "family": family,
                "size": size, "parts": _element_parts(element)})
        boxes.extend(pageboxes)
    for b in boxes:
        text = "".join(b.pop("parts"))
        b["text"] = text
        b["nchars"] = len(text.strip())
    return pages, boxes


def boxes_from_xml_df(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Distributed ingest: (doc_id string, xml binary) -> (pages df,
    boxes df).  One parse per document inside an Arrow batch; the two
    outputs share the scan (parsed twice — the parse is cheap relative
    to the downstream shuffle and keeping the operator a pure 1->N
    mapInPandas beats a cached multi-output kernel at scale)."""
    def run(kind: str):
        def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                rows = []
                for doc_id, xml in zip(pdf["doc_id"], pdf["xml"]):
                    pages, boxes = parse_pdf2xml(bytes(xml), doc_id)
                    rows.extend(pages if kind == "pages" else boxes)
                yield pd.DataFrame(rows) if rows else pd.DataFrame()
        return gen
    pages = df.mapInPandas(run("pages"), PAGE_SCHEMA)
    boxes = df.mapInPandas(run("boxes"), BOX_SCHEMA)
    return pages, boxes


def _mode(df: DataFrame, value_col: str, out: str,
          largest_tie: bool = False) -> DataFrame:
    """Per-doc mode of value_col (count desc; ties -> smallest value,
    or largest when largest_tie — reference ties are Counter insertion
    order, see module docstring)."""
    tie = F.desc(value_col) if largest_tie else F.asc(value_col)
    w = Window.partitionBy("doc_id").orderBy(F.desc("cnt"), tie)
    return (df.groupBy("doc_id", value_col)
            .agg(F.count("*").alias("cnt"))
            .withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") == 1)
            .select("doc_id", F.col(value_col).alias(out)))


def _binned_margin(edges: DataFrame, col: str, out: str) -> DataFrame:
    """findmargin(quantize=True, trunc=ceil) (pdfanalyze.py:317-352):
    ceil-quantize into bins of 10, count, keep the LARGEST bin among
    those tied at the top count."""
    binned = edges.withColumn(
        "bin", ((F.col(col) + F.lit(9)) / 10).cast("int") * 10)
    counts = binned.groupBy("doc_id", "bin").agg(F.count("*").alias("cnt"))
    w = Window.partitionBy("doc_id")
    return (counts
            .withColumn("maxcnt", F.max("cnt").over(w))
            .where(F.col("cnt") == F.col("maxcnt"))
            .groupBy("doc_id").agg(F.max("bin").alias(out)))


def margin_metrics_df(boxes: DataFrame, pages: DataFrame,
                      twopage: bool = True,
                      header_threshold: float = 0.002,
                      footer_threshold: float = 0.002) -> DataFrame:
    """Per-doc spatial metrics: leftmargin/rightmargin (+ _even when
    twopage), topmargin, bottommargin, pagewidth, pageheight
    (reference pdfanalyze.py:260-306).  Every aggregation is keyed on
    doc_id — one shuffle family, arbitrarily many documents."""
    dims = pages.groupBy("doc_id").agg(
        F.max("width").alias("pagewidth"),
        F.max("height").alias("pageheight"))
    # midpage = most-common page width / 2 (ties -> first page,
    # matching Counter insertion order = page order)
    wmode = Window.partitionBy("doc_id").orderBy(
        F.desc("cnt"), F.asc("first_page"))
    midpage = (pages.groupBy("doc_id", "width")
               .agg(F.count("*").alias("cnt"),
                    F.min("page").alias("first_page"))
               .withColumn("rn", F.row_number().over(wmode))
               .where(F.col("rn") == 1)
               .select("doc_id", (F.col("width") / 2).alias("midpage")))
    b = boxes.join(midpage, "doc_id")
    odd = b.where((F.col("page") % 2 == 1) | F.lit(not twopage))
    lefts = odd.where(F.col("left") < F.col("midpage"))
    rights = odd.where(F.col("right") > F.col("midpage"))
    metrics = (dims
               .join(_mode(lefts, "left", "leftmargin"), "doc_id", "left")
               .join(_binned_margin(rights, "right", "rightmargin"),
                     "doc_id", "left"))
    if twopage:
        even = b.where(F.col("page") % 2 == 0)
        le = even.where(F.col("left") < F.col("midpage"))
        re_ = even.where(F.col("right") > F.col("midpage"))
        metrics = (metrics
                   .join(_mode(le, "left", "leftmargin_even"),
                         "doc_id", "left")
                   .join(_binned_margin(re_, "right", "rightmargin_even"),
                         "doc_id", "left"))

    # vertical zones: cumulative char-count threshold scan
    tot = boxes.groupBy("doc_id").agg(F.sum("nchars").alias("total_chars"))
    wtop = (Window.partitionBy("doc_id").orderBy("top")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    header = (boxes.groupBy("doc_id", "top")
              .agg(F.sum("nchars").alias("c"))
              .withColumn("cum", F.sum("c").over(wtop))
              .join(tot, "doc_id")
              .where(F.col("cum") > F.lit(header_threshold)
                     * F.col("total_chars"))
              .groupBy("doc_id")
              .agg((F.min("top") - 1).alias("topmargin")))
    wbot = (Window.partitionBy("doc_id").orderBy(F.desc("bottom"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    footer = (boxes.join(dims, "doc_id")
              # range(max-1, -1, -1): a bottom at exactly max
              # pageheight is never accumulated
              .where(F.col("bottom") < F.col("pageheight"))
              .groupBy("doc_id", "bottom")
              .agg(F.sum("nchars").alias("c"))
              .withColumn("cum", F.sum("c").over(wbot))
              .join(tot, "doc_id")
              .where(F.col("cum") > F.lit(footer_threshold)
                     * F.col("total_chars"))
              .groupBy("doc_id")
              .agg((F.max("bottom") + 1).alias("bottommargin")))
    return metrics.join(header, "doc_id", "left").join(footer, "doc_id",
                                                       "left")


def _weight(family):
    """Bold=2 / Italic=1 / regular=0 (pdfanalyze.py:356-364)."""
    return (F.when(family.contains("Bold"), 2)
            .when(family.contains("Italic"), 1).otherwise(0))


def style_metrics_df(boxes: DataFrame,
                     significance: float = 0.005) -> DataFrame:
    """Per-doc default + h1-h3 styles (pdfanalyze.py:370-390):
    char-weighted (family, size) histogram; default = most used; h1-h3
    = styles strictly above default by (size, weight) with use above
    ``significance * total_chars``, largest first."""
    hist = (boxes.groupBy("doc_id", "family", "size")
            .agg(F.sum("nchars").alias("cnt"))
            .withColumn("weight", _weight(F.col("family"))))
    wdoc = Window.partitionBy("doc_id")
    # default: ties -> larger (size, weight), then family asc
    wdef = wdoc.orderBy(F.desc("cnt"), F.desc("size"), F.desc("weight"),
                        F.asc("family"))
    hist = (hist
            .withColumn("total", F.sum("cnt").over(wdoc))
            .withColumn("rn", F.row_number().over(wdef)))
    default = hist.where(F.col("rn") == 1).select(
        "doc_id", F.col("family").alias("default_family"),
        F.col("size").alias("default_size"),
        F.col("weight").alias("d_weight"))
    larger = (hist.join(default, "doc_id")
              .where(((F.col("size") > F.col("default_size"))
                      | ((F.col("size") == F.col("default_size"))
                         & (F.col("weight") > F.col("d_weight"))))
                     & (F.col("cnt") > F.lit(significance)
                        * F.col("total")))
              .withColumn("hrank", F.row_number().over(
                  wdoc.orderBy(F.desc("size"), F.desc("weight"),
                               F.desc("cnt"), F.asc("family")))))
    heads = larger.groupBy("doc_id").agg(*[
        f for i in (1, 2, 3) for f in (
            F.max(F.when(F.col("hrank") == i, F.col("family")))
            .alias(f"h{i}_family"),
            F.max(F.when(F.col("hrank") == i, F.col("size")))
            .alias(f"h{i}_size"))])
    return (default.drop("d_weight")
            .join(heads, "doc_id", "left"))


def metrics_df(boxes: DataFrame, pages: DataFrame, twopage: bool = True,
               header_threshold: float = 0.002,
               footer_threshold: float = 0.002,
               style_significance: float = 0.005) -> DataFrame:
    """One row per doc_id with all spatial + style metrics — the
    engine twin of PDFAnalyzer.metrics() (pdfanalyze.py:99-185)."""
    return (margin_metrics_df(boxes, pages, twopage,
                              header_threshold, footer_threshold)
            .join(style_metrics_df(boxes, style_significance), "doc_id")
            .withColumn("scanned_source", F.lit(False)))


def classify_boxes(boxes: DataFrame, metrics: DataFrame) -> DataFrame:
    """Tag each box with its typographic role — the input the PDF
    structure-recovery FSM consumes (the reference's repos map
    analyzer styles to default/h1/h2/h3 the same way).  Roles:
    h1/h2/h3/default by exact (family, size) style match, else
    'other'; boxes inside the header/footer zones are 'pageheader' /
    'pagefooter' regardless of style.  Broadcast-joins the per-doc
    metrics (tiny: one row per document)."""
    m = F.broadcast(metrics)
    out = boxes.join(m, "doc_id", "left")
    style_role = F.coalesce(*[
        F.when((F.col("family") == F.col(f"{s}_family"))
               & (F.col("size") == F.col(f"{s}_size")), F.lit(s))
        for s in ("h1", "h2", "h3")],
        F.when((F.col("family") == F.col("default_family"))
               & (F.col("size") == F.col("default_size")),
               F.lit("default")),
        F.lit("other"))
    role = (F.when(F.col("bottom") <= F.col("topmargin"),
                   F.lit("pageheader"))
            .when(F.col("top") >= F.col("bottommargin"),
                  F.lit("pagefooter"))
            .otherwise(style_role))
    return out.select(*boxes.columns, role.alias("role"))
