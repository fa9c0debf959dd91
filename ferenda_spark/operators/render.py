"""XHTML+RDFa rendering + static-site sink (SURVEY §2 P10 render /
S12 static-site) — the forward direction of the reference's parse
output (documentrepository.py render_xhtml + generate/toc/news
presentation, toc.py / newscriteria.py / wsgiapp static pages),
re-expressed Spark-first:

- ``render_xhtml``: one document's triple set -> an XHTML+RDFa page
  (the same RDFa subset ``operators/rdfa.extract_rdfa`` consumes:
  xmlns prefixes, about scoping, property/content, rel/href, datatype
  qnames, element xml:lang with '' reset).  The correctness gate is
  the ROUND TRIP: extract_rdfa(render_xhtml(G)) == G as a triple set,
  for the engine's own graphs AND the reference's committed distilled
  fixtures (tests/test_render.py) — i.e. render is the exact inverse
  of the distill direction the reference regression-tests.
- ``render_documents``: the Spark stage — groupBy(url) +
  applyInPandas render (one shuffle; ~tens of triples per group).
- ``toc_pages`` / ``feed_pages``: the A3/A6 presentation surfaces as
  PURE COLUMNAR jobs (sort_array + concat_ws aggregation — no UDF):
  per-year TOC html pages and paged Atom feeds ordered by issued desc.
- ``write_site``: materializes (path, content) rows — locally a
  parquet table of pages; at scale the same DataFrame writes straight
  to object storage partitioned by page kind.

Scale notes: rendering is embarrassingly parallel after one groupBy
shuffle keyed on url; TOC/feed aggregation shuffles once on the facet
key.  Nothing collects to the driver.
"""

from __future__ import annotations

from xml.sax.saxutils import escape, quoteattr

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ferenda_spark import ns

XHTML_NS = "http://www.w3.org/1999/xhtml"

_DOCTYPE = ('<!DOCTYPE html PUBLIC "-//W3C//DTD XHTML+RDFa 1.0//EN"\n'
            '"http://www.w3.org/MarkUp/DTD/xhtml-rdfa-1.dtd">')


def _qname_table(uris: list[str],
                 extra_prefixes: dict[str, str] | None = None):
    """prefix->base table covering every URI, minting nsN prefixes for
    unknown namespaces; returns (table, qname_fn)."""
    table: dict[str, str] = dict(ns.NS)
    if extra_prefixes:
        table.update(extra_prefixes)
    by_base = {b: p for p, b in table.items()}
    n = 0

    def split(uri: str) -> tuple[str, str]:
        cut = max(uri.rfind("#"), uri.rfind("/")) + 1
        if cut == 0:           # compact qname kept verbatim by the
            cut = uri.rfind(":") + 1   # distill side (e.g. 'xsd:date')
        return uri[:cut], uri[cut:]

    for u in uris:
        base, _ = split(u)
        if base and base not in by_base:
            nonlocal_n = f"ns{n}"
            n += 1
            by_base[base] = nonlocal_n
            table[nonlocal_n] = base

    def qname(uri: str) -> str:
        base, local = split(uri)
        return f"{by_base[base]}:{local}"

    used = {by_base[split(u)[0]] for u in uris}
    return {p: table[p] for p in sorted(used)}, qname


def render_xhtml(triples: list[dict], doc_uri: str,
                 lang: str | None = None,
                 prefixes: dict[str, str] | None = None) -> str:
    """One document's triples -> XHTML+RDFa string.

    ``triples``: dicts with subj/pred/obj/obj_is_uri/obj_lang/
    obj_datatype.  Subjects: the doc itself, its #fragments (nested
    divs in fragment order), and any foreign subjects (sibling divs).
    Literals render as <span property content> (xml:lang per triple,
    '' resets when the root declares a language); URI objects as
    <link rel href>."""
    pred_uris = [t["pred"] for t in triples] + [
        t["obj_datatype"] for t in triples if t.get("obj_datatype")]
    table, qname = _qname_table(pred_uris, prefixes)

    def key(t):
        return (t["pred"], t["obj"], t.get("obj_lang") or "",
                t.get("obj_datatype") or "")

    by_subj: dict[str, list[dict]] = {}
    for t in triples:
        by_subj.setdefault(t["subj"], []).append(t)

    def emit_triples(subj: str, pad: str) -> list[str]:
        out = []
        for t in sorted(by_subj.get(subj, []), key=key):
            if t.get("obj_is_uri"):
                out.append(f"{pad}<link rel={quoteattr(qname(t['pred']))} "
                           f"href={quoteattr(t['obj'])}/>")
            else:
                a = [f"property={quoteattr(qname(t['pred']))}",
                     f"content={quoteattr(t['obj'])}"]
                if t.get("obj_datatype"):
                    a.append(f"datatype="
                             f"{quoteattr(qname(t['obj_datatype']))}")
                else:
                    # ALWAYS explicit ('' = no language): the distill
                    # side seeds its inherited language from the first
                    # xml:lang it sees, so implicit inheritance would
                    # be ambiguous on docs whose root declares none
                    a.append(f'xml:lang="{t.get("obj_lang") or ""}"')
                out.append(f"{pad}<span {' '.join(a)}/>")
        return out

    fragments = sorted(s for s in by_subj
                       if s.startswith(doc_uri + "#"))
    foreign = sorted(s for s in by_subj
                     if s != doc_uri and s not in fragments)

    xmlns = [f'xmlns="{XHTML_NS}"'] + [
        f'xmlns:{p}="{escape(b)}"' for p, b in table.items()]
    lang_attr = f' xml:lang="{lang}"' if lang else ""
    lines = ["<?xml version='1.0' encoding='utf-8'?>", _DOCTYPE,
             f"<html {' '.join(xmlns)}{lang_attr}>",
             f"  <head about={quoteattr(doc_uri)}>",
             "    <title>%s</title>" % escape(next(
                 (t["obj"] for t in by_subj.get(doc_uri, [])
                  if t["pred"] == ns.DCT_TITLE), doc_uri)),
             "  </head>",
             f"  <body about={quoteattr(doc_uri)}>"]
    lines += emit_triples(doc_uri, "    ")
    # nested fragment divs: a fragment whose URI prefixes another
    # contains it (S1 contains S1.1), mirroring the reference's nested
    # document parts
    open_stack: list[str] = []
    for frag in fragments:
        while open_stack and not frag.startswith(open_stack[-1] + "."):
            lines.append("  " * (len(open_stack) + 1) + "</div>")
            open_stack.pop()
        pad = "  " * (len(open_stack) + 2)
        lines.append(f"{pad[:-2]}<div about={quoteattr(frag)}>")
        lines += emit_triples(frag, pad)
        open_stack.append(frag)
    while open_stack:
        lines.append("  " * (len(open_stack) + 1) + "</div>")
        open_stack.pop()
    for subj in foreign:
        lines.append(f"    <div about={quoteattr(subj)}>")
        lines += emit_triples(subj, "      ")
        lines.append("    </div>")
    lines += ["  </body>", "</html>"]
    return "\n".join(lines)


# ---------------------------------------------------------------------------
# Spark stages

def render_documents(triples: DataFrame, lang_by_url: DataFrame | None = None,
                     prefixes: dict[str, str] | None = None) -> DataFrame:
    """(url, subj, pred, obj, obj_is_uri, obj_lang, obj_datatype) ->
    (url, xhtml).  One groupBy shuffle; per-group python renders tens
    of rows (Arrow-batched applyInPandas)."""
    import pandas as pd

    cols = ["subj", "pred", "obj", "obj_is_uri", "obj_lang",
            "obj_datatype"]
    t = triples
    if lang_by_url is not None:
        t = t.join(lang_by_url, "url", "left")
    else:
        t = t.withColumn("lang", F.lit(None).cast("string"))

    def render_group(pdf: pd.DataFrame) -> pd.DataFrame:
        url = pdf["url"].iloc[0]
        lang = next((v for v in pdf["lang"] if v is not None), None)
        trips = [
            {c: (None if pd.isna(r[c]) and c != "obj_is_uri" else r[c])
             for c in cols}
            for _, r in pdf.iterrows()]
        doc_uri = url.split("#")[0]
        return pd.DataFrame(
            [{"url": url,
              "xhtml": render_xhtml(trips, doc_uri, lang=lang,
                                    prefixes=prefixes)}])

    return (t.select("url", "lang", *cols)
            .groupBy("url").applyInPandas(
                render_group, "url string, xhtml string"))


def _xml_text(col: Column) -> Column:
    """Columnar XML text escape (& first, then angle brackets) — the
    columnar builders must escape exactly like render_xhtml's
    xml.sax.saxutils.escape does for the per-doc pages."""
    out = F.regexp_replace(col, "&", "&amp;")
    out = F.regexp_replace(out, "<", "&lt;")
    return F.regexp_replace(out, ">", "&gt;")


def _xml_attr(col: Column) -> Column:
    return F.regexp_replace(_xml_text(col), '"', "&quot;")


def toc_pages(triples: DataFrame) -> DataFrame:
    """A3/S12: per-issued-year TOC html pages — pure columnar
    (conditional pivot + sort_array + concat_ws; one shuffle).
    Titles/hrefs are XML-escaped; a null title renders as an empty
    anchor text (coalesce) so n_docs always equals the emitted items."""
    docs = (triples.where(~F.col("subj").contains("#"))
            .groupBy("subj")
            .agg(F.max(F.when(F.col("pred") == ns.DCT_TITLE,
                              F.col("obj"))).alias("title"),
                 F.max(F.when(F.col("pred") == ns.DCT_ISSUED,
                              F.col("obj"))).alias("issued")))
    year = F.substring("issued", 1, 4)
    item = F.concat(F.lit('<li><a href="'), _xml_attr(F.col("subj")),
                    F.lit('">'), _xml_text(F.coalesce("title", F.lit(""))),
                    F.lit("</a></li>"))
    return (docs.where(year.isNotNull())
            .groupBy(year.alias("year"))
            .agg(F.concat_ws(
                "\n", F.sort_array(F.collect_list(item))).alias("items"),
                F.count("*").cast("long").alias("n_docs"))
            .select(
                F.concat(F.lit("toc/issued/"), "year",
                         F.lit(".html")).alias("path"),
                "n_docs",
                F.concat(F.lit("<html><body><h1>Documents "),
                         F.col("year"), F.lit("</h1>\n<ul>\n"),
                         F.col("items"),
                         F.lit("\n</ul></body></html>")).alias("content")))


def feed_pages(triples: DataFrame, page_size: int = 25) -> DataFrame:
    """A6/S12: paged Atom feed XML ordered by issued desc — columnar;
    the global page numbering reuses the two-pass rank pattern (per-
    year local rank + broadcast prefix sums, no partitionless window
    over the doc table)."""
    from pyspark.sql.window import Window

    docs = (triples.where(~F.col("subj").contains("#"))
            .groupBy("subj")
            .agg(F.max(F.when(F.col("pred") == ns.DCT_TITLE,
                              F.col("obj"))).alias("title"),
                 F.max(F.when(F.col("pred") == ns.DCT_ISSUED,
                              F.col("obj"))).alias("issued"))
            .where(F.col("issued").isNotNull()))
    year = F.substring("issued", 1, 4).alias("year")
    local = (docs.select("subj", "title", "issued", year)
             .withColumn("lrn", F.row_number().over(
                 Window.partitionBy("year")
                 .orderBy(F.desc("issued"), F.asc("subj")))))
    counts = (local.groupBy("year").agg(F.count("*").alias("n"))
              .withColumn("offset",
                          F.coalesce(
                              F.sum("n").over(
                                  Window.orderBy(F.desc("year"))
                                  .rowsBetween(Window.unboundedPreceding,
                                               -1)), F.lit(0))))
    ranked = (local.join(F.broadcast(counts.select("year", "offset")),
                         "year")
              .withColumn("rn", F.col("lrn") + F.col("offset")))
    entry = F.concat(
        F.lit("<entry><id>"), _xml_text(F.col("subj")),
        F.lit("</id><title>"), _xml_text(F.coalesce("title", F.lit(""))),
        F.lit("</title><updated>"), F.col("issued"),
        F.lit("</updated></entry>"))
    page = ((F.col("rn") - 1) / page_size).cast("long")
    return (ranked.groupBy(page.alias("page"))
            .agg(F.concat_ws("\n", F.sort_array(
                F.collect_list(F.struct("rn", entry.alias("e")))
            ).getField("e")).alias("entries"),
                F.count("*").cast("long").alias("n_docs"))
            .select(
                F.concat(F.lit("feed/page"), "page",
                         F.lit(".atom")).alias("path"),
                "n_docs",
                F.concat(
                    F.lit('<feed xmlns="http://www.w3.org/2005/Atom">\n'),
                    F.col("entries"), F.lit("\n</feed>")).alias("content")))


def write_site(doc_pages: DataFrame, toc: DataFrame, feeds: DataFrame,
               out_dir: str) -> None:
    """S12 sink: one pages table (kind, path, content) — parquet
    locally; the same frame writes to object storage at scale."""
    pages = (doc_pages.select(
        F.lit("doc").alias("kind"),
        F.concat(F.lit("res/"),
                 F.regexp_replace("url", "^https?://[^/]+/", ""),
                 F.lit(".xhtml")).alias("path"),
        F.col("xhtml").alias("content"))
        .unionByName(toc.select(F.lit("toc").alias("kind"), "path",
                                "content"))
        .unionByName(feeds.select(F.lit("feed").alias("kind"), "path",
                                  "content")))
    (pages.write.mode("overwrite").partitionBy("kind")
     .parquet(f"{out_dir}/site"))
