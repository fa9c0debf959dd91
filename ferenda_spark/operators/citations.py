"""Citation / reference recognition — per-document kernel functions
(SURVEY.md §2 C1/C4/C5) + the span model.

Reference grammars re-expressed as regexes with the same observable
matches (validated against the reference's own committed goldens in
/root/reference/test/files/citation/url/*.{txt,result} — see
tests/test_reference_parity.py):

- url:   scheme://netloc/path?query#fragment with the pyparsing
         trailing-token exclusion (chars ',).' never end a part)
         (/root/reference/ferenda/citationpatterns.py:16-38)
- rfc:   "section X.Y of [RFC N]", bare "section X.Y" (doc-relative),
         bare "[RFC N]" — pyparsing literals have NO word boundary, so
         neither do these regexes ("subsection 3" matches "section 3"),
         and rfcnum is zero-left-stripped / secref dot-right-stripped
         at mint time (rfc.py:429-451 make_citation_parser)

The recognizer runs inside the Arrow-batched extract stage and emits
spans only; URI minting happens columnarly (operators/coin.py /
operators/triples.py), mirroring the reference's split between
CitationParser (scan) and URIFormatter (mint)
(citationparser.py:65-96, uriformatter.py:7-52).
"""

from __future__ import annotations

import re

# --- url grammar (citationpatterns.py:16-38) -------------------------------
# pyparsing shape: parts are delimitedList(token, Word(",)."), combine)
# => chars ',).' may appear INSIDE a part but never terminate it.
_NL_TOK = r"[^\s/.?#,)]+"                       # netloc token (no / .)
_NETLOC = rf"{_NL_TOK}(?:\.{_NL_TOK})*"
_P_TOK = r"[^\s?#,).]+"                          # path token (/ allowed)
_PATH = rf"{_P_TOK}(?:[,).]+{_P_TOK})*"
_Q_TOK = r"[^\s#,).]+"                           # query token (? allowed)
_QUERY = rf"{_Q_TOK}(?:[,).]+{_Q_TOK})*"
_F_TOK = r"[^\s,).]+"
_FRAG = rf"{_F_TOK}(?:[,).]+{_F_TOK})*"

_URL_RE = re.compile(
    rf"(?P<scheme>https?|ftp)://(?P<netloc>{_NETLOC})"
    rf"(?P<path>{_PATH})?"
    rf"(?:\?(?P<query>{_QUERY}))?"
    rf"(?:#(?P<fragment>{_FRAG}))?")

# --- rfc grammar (rfc.py:437-447); literals are case-insensitive and
# boundary-free like CaselessLiteral / Literal in pyparsing ----------------
# only "section" is caseless (CaselessLiteral); "RFC" is case-sensitive
# pyparsing's Word(nums+".") needs no separating whitespace and can be
# dots-only ("subsection. 9" -> Sec "." -> secref "" -> '#S'), so the
# number group is \s*[\d.]+ — the goldens encode this quirk (RFC 6931 S7)
_SEC_OF_RFC_RE = re.compile(
    r"(?i:section)\s*([\d.]+)\s+of\s+\[?\s*RFC\s*(\d+)(?:\s*\])?")
_SEC_RE = re.compile(r"(?i:section)\s*([\d.]+)")
_RFC_RE = re.compile(r"\[?RFC\s*(\d+)(?:\s*\])?")


# --- eulaw grammar (citationpatterns.py:40-76): Swedish-language EU
# legislation citations.  Faithful to the pyparsing grammar, NOT its
# docstring ("direktiv 2007/42/EU" does not match — Association is only
# EG|EEG).  The reference's uriformats.eulaw raises NotImplementedError
# (uriformats.py:47-58); CELEX minting here is an engine extension. ----
_EU_MONTH = ("januari|februari|mars|april|maj|juni|juli|augusti"
             "|september|oktober|november|december")
_EU_INST = r"(?:Europaparlamentets\s+och\s+rådets|rådets|kommissionens)"
_EU_DIRECTIVE = r"(?:\d{4}|\d{2})/\d+/(?:EEG|EG)"
_EU_REGULATION = r"\(\s*(?:EEG|EG)\s*\)\s*nr\s+\d+/(?:\d{4}|\d{2})"
_EU_DATE = rf"\d{{1,2}}\s+(?:{_EU_MONTH})\s+\d{{4}}"
_EU_ARTICLE = r"artikel\s+(\d+)(?:\.(\d+))?"
_EU_LEGALACT = (rf"{_EU_INST}\s+(direktiv|förordning)\s+"
                rf"((?:{_EU_DIRECTIVE})|(?:{_EU_REGULATION}))"
                rf"\s+av\s+den\s+({_EU_DATE})")

_EU_REF = rf"(?:{_EU_DIRECTIVE})|(?:{_EU_REGULATION})"
# acts: optional institution, enumerable references, optional date —
# the richer shape of the reference's LegalRef EBNF (its committed
# EGLag goldens); the citationpatterns.eulaw pyparsing grammar is the
# mandatory-institution/date subset of this
_EU_ACTS = (rf"(?:{_EU_INST}\s+)?(direktiv|förordning)\s+({_EU_REF})"
            rf"((?:\s*(?:,|och|samt|eller)\s+(?:{_EU_REF}))*)"
            rf"(?:\s+av\s+den\s+({_EU_DATE}))?")

_EULAW_RES = [  # MatchFirst order: ArticleLegalact, Legalact, Article
    ("article_legalact", re.compile(rf"{_EU_ARTICLE}\s+i\s+{_EU_ACTS}")),
    ("legalact", re.compile(_EU_ACTS)),
    ("article", re.compile(_EU_ARTICLE)),
]

_EU_DIR_PARTS = re.compile(r"(\d{4}|\d{2})/(\d+)/(EEG|EG)")
_EU_REG_PARTS = re.compile(
    r"\(\s*(EEG|EG)\s*\)\s*nr\s+(\d+)/(\d{4}|\d{2})")
_EU_REF_RE = re.compile(_EU_REF)


def _ref_parts(actref: str, out: dict):
    if dm := _EU_DIR_PARTS.fullmatch(actref):
        out["year"], out["ordinal"], out["association"] = dm.groups()
    elif rm := _EU_REG_PARTS.fullmatch(actref):
        out["association"], out["ordinal"], out["year"] = rm.groups()


def _eulaw_parts(kind: str, m: re.Match) -> list[dict]:
    """One dict per referenced act (enumerations distribute the
    acttype: 'kommissionens direktiv 91/155/EEG, 93/67/EEG och
    93/105/EG' yields three)."""
    base = {"kind": "eulaw", "form": kind, "span": m.group(0),
            "article": None, "subarticle": None, "acttype": None,
            "year": None, "ordinal": None, "association": None,
            "date": None}
    g = m.groups()
    if kind == "article":
        base["article"], base["subarticle"] = g[0], g[1]
        return [base]
    off = 2 if kind == "article_legalact" else 0
    if kind == "article_legalact":
        base["article"], base["subarticle"] = g[0], g[1]
    base["acttype"], first_ref, extra, base["date"] = \
        g[off], g[off + 1], g[off + 2], g[off + 3]
    _ref_parts(first_ref, base)
    out = [base]
    for em in _EU_REF_RE.finditer(extra or ""):
        d = dict(base, article=None, subarticle=None, span=em.group(0),
                 year=None, ordinal=None, association=None)
        _ref_parts(em.group(0), d)
        out.append(d)
    return out


def find_eulaw_citations(text: str) -> list[dict]:
    """All eulaw citation spans, non-overlapping, MatchFirst priority
    (article+act > act > bare article) like the reference's grammars;
    enumerated act lists yield one entry per act."""
    spans: list[tuple[int, int, list]] = []
    taken: list[tuple[int, int]] = []

    def free(s, e):
        return all(e <= ts or s >= te for ts, te in taken)

    for kind, rx in _EULAW_RES:
        for m in rx.finditer(text):
            if free(m.start(), m.end()):
                spans.append((m.start(), m.end(), _eulaw_parts(kind, m)))
                taken.append((m.start(), m.end()))
    spans.sort(key=lambda t: t[0])
    return [d for _, _, ds in spans for d in ds]


def eulaw_celex_uri(parts: dict,
                    base: str = "http://eur-lex.europa.eu/CELEX:",
                    frag_prefix: str = "A") -> str | None:
    """CELEX URI for a recognized act: sector 3, 4-digit year,
    L=directive / R=regulation, 4-digit number, article fragment.
    With base='https://lagen.nu/ext/celex/' and frag_prefix='' this is
    the exact scheme of the reference's committed EGLag goldens
    (test/files/legalref/EGLag; its in-code formatter is
    unimplemented — uriformats.py:47-58)."""
    uri = None
    if parts["year"] and parts["ordinal"]:
        y = parts["year"]
        if len(y) == 2:
            y = ("19" if int(y) > 50 else "20") + y
        t = "L" if parts["acttype"] == "direktiv" else "R"
        uri = f"{base}3{y}{t}{int(parts['ordinal']):04d}"
    if uri and parts["article"]:
        frag = parts["article"]
        if parts["subarticle"]:
            frag += "." + parts["subarticle"]
        uri += f"#{frag_prefix}{frag}"
    return uri


# ECJ case-number grammar (the reference's euratt.ebnf:
# SimpleECJCase ::= (Case,Whitespace)?, ECJCaseRef;
# ECJCaseRef ::= ('C'/'T'/'F'), '-', serial, '/', year).  The committed
# input files use U+2011 NON-BREAKING HYPHEN ("Case F‑23/07",
# "Case C‑197/09"), so the hyphen class covers the common dash points.
_ECJ_RE = re.compile(
    r"(?:\bCase\s+)?\b([CTF])[-‐‑‒–](\d{1,4})/(\d{2,4})\b")


def find_ecj_citations(text: str) -> list[dict]:
    """All ECJ case references (C-197/09, T-13/99, F-23/07 forms, with
    or without a leading 'Case'), textual order, as
    {span, kind, decision, serial, year} dicts
    (legalref.py:149-151 EURATTSFALL root + euratt.ebnf)."""
    out = []
    for m in _ECJ_RE.finditer(text):
        out.append({"span": m.group(0), "kind": "ecj",
                    "decision": m.group(1), "serial": m.group(2),
                    "year": m.group(3), "start": m.start(),
                    "end": m.end()})
    return out


def ecj_celex_uri(parts: dict,
                  base: str = "https://lagen.nu/ext/celex/") -> str:
    """CELEX URI for an ECJ case (legalref.py:1352-1371
    eurattsfall_format_uri): sector 6, 4-digit year (2-digit pivots at
    54: <54 -> 20xx else 19xx), descriptor C->J / T->A / F->W, serial
    zero-padded to 4.  No committed expected outputs exist for the two
    ECJ input files (VERDICT r02 #6), so the scheme mirrors the eulaw
    CELEX minting above and is unit-gated."""
    y = parts["year"]
    if len(y) == 2:
        y = ("20" if int(y) < 54 else "19") + y
    desc = {"C": "J", "T": "A", "F": "W"}[parts["decision"]]
    return f"{base}6{y}{desc}{int(parts['serial']):04d}"


def format_url(d: dict) -> str:
    """Inverse of url_parts: parts dict -> url string (the reference's
    uriformats.url, uriformats.py:28-44; goldens
    test/files/uriformat/url/*.{json,txt})."""
    out = f"{d['scheme']}://{d['netloc']}{d.get('path', '')}"
    if "query" in d:
        out += "?" + d["query"]
    if "fragment" in d:
        out += "#" + d["fragment"]
    return out


def url_parts(text: str) -> dict | None:
    """Parse ``text`` as one url; parts dict like the reference's
    ParseResults (absent keys omitted), or None."""
    m = _URL_RE.fullmatch(text)
    if not m:
        return None
    return {k: v for k, v in m.groupdict().items() if v is not None}


def _rfcnum(raw: str) -> str:
    return raw.lstrip("0") or "0"


def find_citations(text: str,
                   grammars: tuple[str, ...] = ("url",)) -> list[dict]:
    """All citation spans in ``text``.  ``grammars`` selects the active
    recognizers per repo (the reference configures CitationParser per
    DocumentRepository: rfc -> rfc/section only, others -> url).
    Kinds: 'url', 'rfc' (rfcnum + optional secref), 'sec' (doc-relative
    section).  Non-overlapping, priority-ordered first-match like the
    reference's grammar list (citationparser.py:57-63)."""
    spans: list[tuple[int, int, dict]] = []
    taken: list[tuple[int, int]] = []

    def free(s, e):
        return all(e <= ts or s >= te for ts, te in taken)

    if "rfc" in grammars:
        for m in _SEC_OF_RFC_RE.finditer(text):
            spans.append((m.start(), m.end(), {
                "span": m.group(0), "kind": "rfc", "url": None,
                "rfcnum": _rfcnum(m.group(2)),
                "secref": m.group(1).rstrip(".")}))
            taken.append((m.start(), m.end()))
        for m in _SEC_RE.finditer(text):
            if free(m.start(), m.end()):
                spans.append((m.start(), m.end(), {
                    "span": m.group(0), "kind": "sec", "url": None,
                    "rfcnum": None, "secref": m.group(1).rstrip(".")}))
                taken.append((m.start(), m.end()))
        for m in _RFC_RE.finditer(text):
            if free(m.start(), m.end()):
                spans.append((m.start(), m.end(), {
                    "span": m.group(0).strip("[]"), "kind": "rfc",
                    "url": None, "rfcnum": _rfcnum(m.group(1)),
                    "secref": None}))
                taken.append((m.start(), m.end()))

    if "url" in grammars:
        for m in _URL_RE.finditer(text):
            if free(m.start(), m.end()):
                spans.append((m.start(), m.end(), {
                    "span": m.group(0), "kind": "url",
                    "url": m.group(0), "rfcnum": None, "secref": None}))
                taken.append((m.start(), m.end()))

    if "ecj" in grammars:
        for c in find_ecj_citations(text):
            # minted CELEX URI travels in the url slot like sfs refs
            if free(c["start"], c["end"]):
                spans.append((c["start"], c["end"], {
                    "span": c["span"], "kind": "ecj",
                    "url": ecj_celex_uri(c), "rfcnum": None,
                    "secref": None}))
                taken.append((c["start"], c["end"]))

    spans.sort(key=lambda t: t[0])
    return [d for _, _, d in spans]
