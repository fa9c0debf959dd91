"""Faithful RFC plaintext parse — per-document kernel (SURVEY.md §2
S6/P5/P6/P8), validated against the reference's OWN committed fixtures
(/root/reference/test/files/repo/rfc/{downloaded,distilled}; see
tests/test_reference_parity.py).

Re-implements, from the behavior contract only:
- TextReader.readparagraph chunking (textreader.py:159-173: split on
  exactly two consecutive newlines) + the faux-bold backspace cleanup
  (rfc.py:463-466);
- the reference's full RFC FSM transition table (rfc.py:132-427):
  rfcheader -> doctitle -> preamble(-section)* -> after-preamble ->
  section/subsection/subsubsection nesting, pagebreak skipping with
  running-header shortTitle capture, "(Abstract)" fallback, unordered
  lists;
- Table of Contents removal + pagebreak cleanup (rfc.py:477-534);
- the two-column header parse (rfc.py:536-634) incl. BCP/STD/FYI
  rdf-type overrides (NOTE: the reference maps STD -> rfc:FYI,
  rfc.py:607-608 — mirrored as-is since the goldens encode it).

Runs inside the Arrow-batched extract stage (operators/extract.py);
output is columnar section/header rows, never an object tree.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from ferenda_spark.operators.fsm import Elem, FSMParser, recurses

# ---------------------------------------------------------------------------
# paragraph chunking (TextReader.readparagraph semantics)

_BACKSPACE_RE = re.compile(".\b")


def rfc_paragraphs(text: str) -> list[str]:
    """Paragraph chunks: split on exactly-2+ consecutive '\\n', leading/
    trailing newlines consumed, faux-bold '.\\b' pairs removed."""
    text = text.replace("\r\n", "\n")
    paras = re.split(r"\n\n+", text.strip("\n"))
    return [_BACKSPACE_RE.sub("", p) for p in paras if p.strip()]


def text_lines(text: str) -> list[str]:
    """TextReader readline iteration (textreader.py:148-157): every
    linesep-delimited line, empty ones included."""
    return text.replace("\r\n", "\n").split("\n")


def text_pages(text: str) -> list[str]:
    """TextReader readpage iteration (textreader.py:175-183): chunks
    delimited by form feed — the page marker RFCs and pdftotext use."""
    return text.replace("\r\n", "\n").split("\f")


# ---------------------------------------------------------------------------
# elements

@dataclass
class Pagebreak:
    shorttitle: str | None = None


class TextElem(Elem):
    """Elem whose flat text keeps ordering of its own string chunks."""


# ---------------------------------------------------------------------------
# recognizers / helpers (rfc.py:137-360)

def _splitcolumns(chunk: str):
    linelens, leftlines, rightlines = [], [], []
    for line in chunk.split("\n"):
        linelens.append(len(line))
        if "   " in line:
            left, right = line.split("   ", 1)
        else:
            left, right = line, ""
        leftlines.append(left)
        rightlines.append(right)
    return leftlines, rightlines, linelens


def is_rfcheader_chunk(chunk: str, lenient: bool = True) -> bool:
    leftlines, rightlines, linelens = _splitcolumns(chunk)
    if len(linelens) < 2:
        return False
    targetlen = linelens[0]
    for idx, length in enumerate(linelens):
        if rightlines[idx] == "" and length > 40:
            return False
        elif rightlines[idx] != "" and length != targetlen and not lenient:
            return False
    return True


_SECTIONSTART = re.compile(r"^(\d[.\d]*) +(.*[^.])$").match


def analyze_sectionstart(chunk: str, basefile: str):
    m = _SECTIONSTART(chunk)
    if m:
        ordinal = m.group(1).rstrip(".")
        return ordinal, m.group(2), f"RFC {basefile}, section {ordinal}"
    return None, chunk, None


def _seg_count(ordinal):
    return (ordinal is not None) and len([s for s in ordinal.split(".") if s])


def is_header_chunk(chunk: str) -> bool:
    strip = chunk.strip()
    return bool(strip and len(strip.split("\n")) == 1
                and not strip.endswith(".") and not chunk.startswith(" "))


def is_preformatted_chunk(chunk: str) -> bool:
    stripped = "\n".join(x[3:] for x in chunk.split("\n"))
    stripped = stripped.replace(".  ", ". ")
    return "  " in stripped or "...." in stripped or ". . . " in stripped


# ---------------------------------------------------------------------------
# the parser instance (transition table = rfc.py:399-424 verbatim)

def rfc_parser(basefile: str) -> FSMParser:
    # several recognizers probe the same peeked chunk per FSM step;
    # memoize the section analysis per chunk identity (hot path: the
    # recognizer chain runs for every paragraph of every document)
    _seg_cache: dict[int, int] = {}

    def _segs(chunk: str) -> int:
        key = id(chunk)
        if key not in _seg_cache:
            _seg_cache.clear()  # only the current chunk matters
            _seg_cache[key] = _seg_count(
                analyze_sectionstart(chunk, basefile)[0])
        return _seg_cache[key]

    def is_pagebreak(p):
        return "\f" in p.reader.peek()

    def is_rfcheader(p):
        return is_rfcheader_chunk(p.reader.peek())

    def is_doctitle(p):
        return True

    def is_section(p):
        return _segs(p.reader.peek()) == 1

    def is_subsection(p):
        return _segs(p.reader.peek()) == 2

    def is_subsubsection(p):
        return _segs(p.reader.peek()) == 3

    def is_header(p):
        return is_header_chunk(p.reader.peek())

    def is_ul_listitem(p):
        return p.reader.peek().strip().startswith("o  ")

    def is_preformatted(p):
        return is_preformatted_chunk(p.reader.peek())

    def is_paragraph(p):
        return True

    # constructors ---------------------------------------------------------

    def make_rfcheader(p):
        chunk = p.reader.next()
        # a spurious blank line can split the header (rfc.py:336-339 /
        # RFC 6912): join the next chunk when it is strictly header-like
        if (not p.reader.at_end()
                and is_rfcheader_chunk(p.reader.peek(), lenient=False)):
            chunk += "\n" + p.reader.next()
        return TextElem(kind="rfcheader", title=chunk)

    def make_doctitle(p):
        return TextElem(kind="doctitle", title=p.reader.next())

    @recurses("preamble-section")
    def make_preamble_section(p):
        return p.make_children(
            TextElem(kind="preamblesection", title=p.reader.next()))

    @recurses("preamble-section")
    def make_abstract(p):
        # older RFCs: preamble starts with prose, not a heading
        return p.make_children(
            TextElem(kind="preamblesection", title="(Abstract)"))

    def skip_pagebreak(p):
        chunk = p.reader.next()
        lastline = chunk.split("\n")[-1]
        parts = re.split("  +", lastline)
        if len(parts) > 2:
            return Pagebreak(shorttitle=parts[1])
        return None

    def make_paragraph(p):
        return " ".join(p.reader.next().split())

    def make_preformatted(p):
        return p.reader.next()

    def _make_sec(kind):
        @recurses(kind)
        def make(p):
            ordinal, title, _ident = analyze_sectionstart(
                p.reader.next(), basefile)
            return p.make_children(
                TextElem(kind=kind, ordinal=ordinal, title=title))
        return make

    make_section = _make_sec("section")
    make_subsection = _make_sec("subsection")
    make_subsubsection = _make_sec("subsubsection")

    @recurses("ul-list")
    def make_unordered_list(p):
        return p.make_children(TextElem(kind="ul"))

    @recurses("listitem")
    def make_listitem(p):
        li = TextElem(kind="li")
        li.append(" ".join(p.reader.next().split()))
        return p.make_children(li)

    @recurses("body")
    def make_body(p):
        return p.make_children(TextElem(kind="body"))

    parser = FSMParser()
    parser.set_recognizers(is_pagebreak, is_rfcheader, is_doctitle,
                           is_section, is_subsection, is_subsubsection,
                           is_header, is_ul_listitem, is_preformatted,
                           is_paragraph)
    common = ("section", "subsection", "subsubsection")
    parser.set_transitions({
        ("body", is_rfcheader): (make_rfcheader, "doctitle"),
        ("doctitle", is_doctitle): (make_doctitle, "preamble"),
        ("preamble", is_header): (make_preamble_section, "preamble-section"),
        ("preamble", is_paragraph): (make_abstract, "preamble-section"),
        ("preamble-section", is_paragraph): (make_paragraph, None),
        ("preamble-section", is_header): (False, None),
        ("preamble-section", is_pagebreak): (skip_pagebreak, None),
        ("preamble-section", is_section): (False, "after-preamble"),
        ("after-preamble", is_section): (make_section, "section"),
        ("section", is_subsection): (make_subsection, "subsection"),
        ("section", is_section): (False, None),
        ("subsection", is_subsubsection): (make_subsubsection, "subsubsection"),
        ("subsection", is_subsection): (False, None),
        ("subsection", is_section): (False, None),
        ("subsubsection", is_subsubsection): (False, None),
        ("subsubsection", is_subsection): (False, None),
        ("subsubsection", is_section): (False, None),
        (common, is_ul_listitem): (make_unordered_list, "ul-list"),
        ("ul-list", is_ul_listitem): (make_listitem, "listitem"),
        ("ul-list", is_paragraph): (False, None),
        ("listitem", is_paragraph): (False, None),
        (common, is_preformatted): (make_preformatted, None),
        (common, is_paragraph): (make_paragraph, None),
        (common, is_pagebreak): (skip_pagebreak, None),
    })
    parser.initial_state = "body"
    parser.initial_constructor = make_body
    return parser


# ---------------------------------------------------------------------------
# post-parse cleanup (rfc.py:475-534)

def cleanup_body(part) -> str | None:
    """Remove Pagebreak markers, returning the recovered running-header
    short title (reference semantics: last pagebreak at a level wins;
    a child's value is used only when this level has none yet)."""
    shorttitle = None
    newparts = []
    for sub in list(part):
        if isinstance(sub, Pagebreak):
            shorttitle = sub.shorttitle
        else:
            if not isinstance(sub, str):
                short = cleanup_body(sub)
                if shorttitle is None:
                    shorttitle = short
            newparts.append(sub)
    part[:] = newparts
    return shorttitle


def _flatten_text(node) -> str:
    """All string content of a node EXCLUDING nested (sub)sections —
    ul/li containers are transparent (their items' text belongs to the
    enclosing section, like parse_recursive sees it)."""
    out = []
    for child in node:
        if isinstance(child, str):
            if child.strip():
                out.append(child)
        elif isinstance(child, TextElem) and child.kind in ("ul", "li"):
            out.append(_flatten_text(child))
    return " ".join(out)


def parse_rfc_text(pre_text: str, basefile: str) -> dict:
    """Full faithful parse: returns dict with keys
    header (str), title, short_title, sections (flat rows), ok, error."""
    paras = rfc_paragraphs(pre_text)
    try:
        body = rfc_parser(basefile).parse(iter(paras))
    except Exception as e:
        return {"ok": False, "error": f"{type(e).__name__}: {e}",
                "header": None, "title": None, "short_title": None,
                "sections": []}

    children = [c for c in body if isinstance(c, TextElem)
                or isinstance(c, Pagebreak)]
    header = None
    title = None
    rest = []
    for c in children:
        if isinstance(c, TextElem) and c.kind == "rfcheader" and header is None:
            header = c.title
        elif isinstance(c, TextElem) and c.kind == "doctitle" and title is None:
            title = " ".join(c.title.split())
        else:
            rest.append(c)

    # drop the first "Table of Contents" preamble section (rfc.py:477-480)
    for c in rest:
        if (isinstance(c, TextElem) and c.kind == "preamblesection"
                and c.title == "Table of Contents"):
            rest.remove(c)
            break

    body[:] = rest
    short_title = cleanup_body(body)

    rows: list[dict] = []
    ps_count = 0

    def walk(node, parent_ord):
        nonlocal ps_count
        for child in node:
            if not isinstance(child, TextElem):
                continue
            if child.kind in ("ul", "li"):
                continue  # text already folded into the section row
            ordinal = child.ordinal
            if child.kind == "preamblesection":
                ps_count += 1
                ordinal = f"PS{ps_count}"
            rows.append({
                "kind": child.kind,
                "ordinal": ordinal,
                "title": child.title,
                "parent_ordinal": parent_ord,
                "text": _flatten_text(child),
            })
            walk(child, ordinal)

    walk(body, None)
    return {"ok": True, "error": None, "header": header, "title": title,
            "short_title": short_title, "sections": rows}
