"""MediaWiki source decoder: XML export dumps -> pages -> block-level
content, the content path for keyword/concept hubs (reference:
ferenda/sources/general/wiki.py:48-267 MediaWiki repo +
keyword.py:163-186 termset extraction from the dump).

The reference delegates wiki-markup parsing to the bundled smc.mw
grammar; this module implements the markup SUBSET its fixtures and the
keyword content path exercise, from scratch:

* ``{{DISPLAYTITLE:...}}`` (wiki.py:344-353), other templates dropped
* ``== heading ==`` levels, ``#``/``*`` list items, blank-line
  paragraphs
* ``'''bold'''`` / ``''italic''`` markers (plain-text projection)
* ``[[Category:X]]`` / localized ``[[Kategori:X]]`` -> dcterms:subject
  category set, removed from the body (wiki.py:230-245 postprocess)
* ``[[target|label]]`` internal links, canonicalized like the Keyword
  repo's canonical_uri (ucfirst + space->underscore, keyword.py:91-93)
* ``[http://url label]`` external links, HTML comments stripped

Distributed shape: one page parses per Arrow batch row inside
mapInPandas (wiki_pages_df) — the same one-task-per-document stage as
the WARC/docformats readers; everything downstream (hub aggregation)
is a doc_id/term groupBy.
"""

from __future__ import annotations

import re
from typing import Iterator
from xml.etree import ElementTree

import pandas as pd
from pyspark.sql import DataFrame

CATEGORY_NS = ("Category", "Kategori")
_EXPORT_NS_RE = re.compile(r"\{http://www\.mediawiki\.org/xml/export[^}]*\}")

PAGE_SCHEMA = ("title string, ns int, page_id long, rev_ts string, "
               "display_title string, wikitext string, "
               "categories array<string>, links array<string>, "
               "text string")


def _local(tag: str) -> str:
    return _EXPORT_NS_RE.sub("", tag)


def _find(el, name: str):
    for child in el.iter():
        if _local(child.tag) == name:
            return child
    return None


def parse_page(xml: bytes | str) -> dict:
    """One exported <page> element (the reference's downloaded_path
    unit, wiki.py:124-146) -> title / ns / id / latest-revision
    timestamp + wikitext."""
    root = ElementTree.fromstring(xml)
    if _local(root.tag) != "page":
        raise ValueError(f"expected <page>, got <{_local(root.tag)}>")
    text_el = _find(root, "text")
    return {
        "title": _find(root, "title").text or "",
        "ns": int(_find(root, "ns").text) if _find(root, "ns") is not None
        else 0,
        "page_id": int(_find(root, "id").text),
        "rev_ts": (_find(root, "timestamp").text
                   if _find(root, "timestamp") is not None else None),
        "wikitext": text_el.text or "" if text_el is not None else "",
    }


def parse_dump(xml: bytes | str,
               keep_namespaces: tuple[str, ...] = CATEGORY_NS,
               skip_titles: tuple[str, ...] = ("Huvudsida",)
               ) -> list[dict]:
    """Full dumpBackup.php XML -> page dicts, with the reference's
    namespace filter: pages whose title prefix is a declared wiki
    namespace are kept only when configured (wiki.py:115-131,
    mediawikinamespaces default ['Category']); the wiki main page is
    skipped (keyword.py:126)."""
    root = ElementTree.fromstring(xml)
    declared = set()
    for el in root.iter():
        if _local(el.tag) == "namespace" and el.text:
            declared.add(el.text)
    pages = []
    for el in root.iter():
        if _local(el.tag) != "page":
            continue
        page = parse_page(ElementTree.tostring(el))
        title = page["title"]
        if title in skip_titles:
            continue
        if ":" in title and title.split(":")[0] in declared:
            if title.split(":")[0] not in keep_namespaces:
                continue
        pages.append(page)
    return pages


def canonical_target(target: str) -> str:
    """Keyword repo URI rule: spaces -> underscores (keyword.py:91-93)
    + MediaWiki's first-letter capitalization."""
    t = target.strip().replace(" ", "_")
    return t[:1].upper() + t[1:] if t else t


_COMMENT_RE = re.compile(r"<!--.*?-->", re.S)
_DISPLAYTITLE_RE = re.compile(r"\{\{DISPLAYTITLE:(.*?)\}\}", re.S)
_TEMPLATE_RE = re.compile(r"\{\{[^{}]*\}\}", re.S)
_CATEGORY_RE = re.compile(
    r"\[\[(?:%s):([^\]|]+)(?:\|[^\]]*)?\]\]" % "|".join(CATEGORY_NS))
_LINK_RE = re.compile(r"\[\[([^\]|]+)(?:\|([^\]]*))?\]\]")
_EXTLINK_RE = re.compile(r"\[(https?://\S+)(?:\s+([^\]]*))?\]")
_BOLD_ITALIC_RE = re.compile(r"'{2,5}")
_HEADING_RE = re.compile(r"^(={1,6})\s*(.*?)\s*\1\s*$")


def _inline(text: str, links: list[str]) -> str:
    """Plain-text projection of inline markup, collecting internal
    link targets (canonicalized) into `links`."""
    def ilink(m: re.Match) -> str:
        target, label = m.group(1), m.group(2)
        links.append(canonical_target(target))
        return label if label is not None else target
    text = _LINK_RE.sub(ilink, text)
    text = _EXTLINK_RE.sub(lambda m: m.group(2) or m.group(1), text)
    return _BOLD_ITALIC_RE.sub("", text)


def wikitext_to_blocks(wikitext: str) -> dict:
    """Wikitext -> {display_title, categories, links, blocks} where
    blocks is a list of {tag, text} dicts (tag: p / h1-h6 / li-ol /
    li-ul) in document order, all plain text."""
    display_title = None

    def dt(m: re.Match) -> str:
        nonlocal display_title
        display_title = m.group(1).strip()
        return ""

    text = _COMMENT_RE.sub("", wikitext)
    text = _DISPLAYTITLE_RE.sub(dt, text)
    # templates can nest one level ({{a|{{b}}}}): strip innermost first
    for _ in range(3):
        text, n = _TEMPLATE_RE.subn("", text)
        if not n:
            break
    categories: list[str] = []
    text = _CATEGORY_RE.sub(
        lambda m: categories.append(m.group(1).strip()) or "", text)

    links: list[str] = []
    blocks: list[dict] = []
    para: list[str] = []

    def flush() -> None:
        if para:
            body = _inline(" ".join(para), links).strip()
            if body:
                blocks.append({"tag": "p", "text": body})
            para.clear()

    for line in text.split("\n"):
        stripped = line.strip()
        if not stripped:
            flush()
            continue
        h = _HEADING_RE.match(stripped)
        if h:
            flush()
            blocks.append({"tag": f"h{len(h.group(1))}",
                           "text": _inline(h.group(2), links).strip()})
        elif stripped[0] in "#*":
            flush()
            kind = "ol" if stripped[0] == "#" else "ul"
            body = _inline(stripped.lstrip("#*"), links).strip()
            blocks.append({"tag": f"li-{kind}", "text": body})
        else:
            para.append(stripped)
    flush()
    return {"display_title": display_title,
            "categories": categories,
            "links": links, "blocks": blocks}


def is_mediawiki_xml(payload: bytes) -> bool:
    """Content-based format detection for the extract dispatch."""
    head = payload.lstrip()[:512]
    return (head.startswith((b"<page", b"<mediawiki"))
            and b"mediawiki.org/xml/export" in head)


def page_row(xml: bytes | str) -> dict:
    """parse_page + markup decode, flattened to the PAGE_SCHEMA row."""
    page = parse_page(xml)
    decoded = wikitext_to_blocks(page["wikitext"])
    return {
        "title": page["title"], "ns": page["ns"],
        "page_id": page["page_id"], "rev_ts": page["rev_ts"],
        "display_title": decoded["display_title"],
        "wikitext": page["wikitext"],
        "categories": decoded["categories"],
        "links": decoded["links"],
        "text": "\n".join(b["text"] for b in decoded["blocks"]),
    }


def wiki_pages_df(df: DataFrame) -> DataFrame:
    """(xml binary) or (xml string) column named `xml` -> decoded page
    rows; one parse per row inside an Arrow batch."""
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [page_row(bytes(x) if not isinstance(x, str) else x)
                    for x in pdf["xml"]]
            yield pd.DataFrame(rows) if rows else pd.DataFrame()
    return df.mapInPandas(gen, PAGE_SCHEMA)
