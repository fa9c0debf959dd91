"""RDFa (subset) triple extraction from parsed XHTML — the inverse of
the reference's render step and exactly what its distill does over
rendered documents (decorators.py:161-187 parses the XHTML+RDFa it just
wrote; integrationAPI.py:240-247 builds the test datasets the same way).

Subset implemented (everything the reference's committed testrepos
fixtures use): xmlns prefix declarations, ``about`` subject scoping
(head/body/div/span), ``property`` with ``content`` attribute or text
content (title), ``rel`` + ``href`` object properties, ``datatype``
qnames, ``xml:lang`` inheritance.  A ``datatype`` without ``property``
yields no triple (RDFa semantics — the committed repo2 fixtures rely on
it).

Per-document kernel in the extract execution model; emits the engine's
standard triple dicts."""

from __future__ import annotations

import re

_XMLNS_RE = re.compile(r'xmlns:([\w-]+)="([^"]+)"')
_LANG_RE = re.compile(r'xml:lang="([^"]+)"')


def extract_rdfa(xhtml: bytes | str) -> list[dict]:
    from ferenda_spark import htmlparse as hp

    text = xhtml.decode("utf-8") if isinstance(xhtml, bytes) else xhtml
    prefixes = dict(_XMLNS_RE.findall(text))
    m = _LANG_RE.search(text)
    doc_lang = m.group(1) if m else None

    def expand(qname: str) -> str:
        pfx, _, local = qname.partition(":")
        return prefixes.get(pfx, pfx + ":") + local

    tree = hp.parse_html(text)
    out: list[dict] = []

    def emit(subj, pred, obj, is_uri=False, lang=None, datatype=None):
        out.append({"subj": subj, "pred": expand(pred), "obj": obj,
                    "obj_is_uri": is_uri, "obj_lang": lang,
                    "obj_datatype": expand(datatype) if datatype else None})

    def walk(node, scope, lang):
        if not isinstance(node, hp.Node):
            return
        about = node.attrs.get("about")
        if about:
            scope = about
        # element-level xml:lang inheritance; xml:lang="" resets to
        # no-language (RDFa/XML spec) — the committed fixtures only
        # carry the root declaration, which this generalizes
        if "xml:lang" in node.attrs:
            lang = node.attrs["xml:lang"] or None
        prop = node.attrs.get("property")
        rel = node.attrs.get("rel")
        if scope and rel and "href" in node.attrs:
            emit(scope, rel, node.attrs["href"], is_uri=True)
        if scope and prop:
            dtype = node.attrs.get("datatype")
            if "content" in node.attrs:
                value = node.attrs["content"]
            else:
                value = "".join(c for c in node.children
                                if isinstance(c, str))
            emit(scope, prop, value,
                 lang=None if dtype else lang, datatype=dtype)
        for c in node.children:
            walk(c, scope, lang)

    walk(tree, None, doc_lang)
    return out
