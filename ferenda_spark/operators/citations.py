"""Citation / reference recognition — per-document kernel functions
(SURVEY.md §2 C1/C4/C5) + the span model.

Reference grammars re-expressed as regexes:
- url:   http/https/ftp with trailing-punctuation exclusion
         (/root/reference/ferenda/citationpatterns.py:16-30)
- rfc:   "section X.Y of [RFC N]", bare "RFC N"
         (/root/reference/ferenda/sources/tech/rfc.py:429-451)

The recognizer runs inside the Arrow-batched extract stage and emits
spans only; URI minting happens columnarly (operators/coin.py /
operators/triples.py), mirroring the reference's split between
CitationParser (scan) and URIFormatter (mint)
(citationparser.py:65-96, uriformatter.py:7-52).
"""

from __future__ import annotations

import re

# trailing chars the reference's url grammar excludes (citationpatterns.py)
_URL_RE = re.compile(r"\b(?:https?|ftp)://[^\s<>\"']+")
_TRAIL = ".,;:!?)'\"]"

_SEC_OF_RFC_RE = re.compile(r"[Ss]ection (\d+(?:\.\d+)*) of \[?RFC (\d+)\]?")
_RFC_RE = re.compile(r"\[?RFC (\d+)\]?")


def find_citations(text: str) -> list[dict]:
    """All citation spans in ``text``; kinds: 'url', 'rfc' (with optional
    secref).  Non-overlapping, longest-match-first like the reference's
    priority-ordered grammar list (citationparser.py:57-63)."""
    spans: list[tuple[int, int, dict]] = []

    for m in _SEC_OF_RFC_RE.finditer(text):
        spans.append((m.start(), m.end(), {
            "span": m.group(0), "kind": "rfc",
            "url": None, "rfcnum": m.group(2), "secref": m.group(1)}))
    taken = [(s, e) for s, e, _ in spans]

    def free(s, e):
        return all(e <= ts or s >= te for ts, te in taken)

    for m in _RFC_RE.finditer(text):
        if free(m.start(), m.end()):
            spans.append((m.start(), m.end(), {
                "span": m.group(0).strip("[]"), "kind": "rfc",
                "url": None, "rfcnum": m.group(1), "secref": None}))
            taken.append((m.start(), m.end()))

    for m in _URL_RE.finditer(text):
        if free(m.start(), m.end()):
            url = m.group(0).rstrip(_TRAIL)
            spans.append((m.start(), m.start() + len(url), {
                "span": url, "kind": "url",
                "url": url, "rfcnum": None, "secref": None}))

    spans.sort(key=lambda t: t[0])
    return [d for _, _, d in spans]
