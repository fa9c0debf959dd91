"""Pure-Python HTML decode/parse/extract with the reference system's
exact semantics — the per-document kernel that runs INSIDE the Arrow
batched extract stage (ferenda_spark.operators.extract).

Reference semantics reproduced here (file:line into /root/reference):
- charset decode with declared encoding + errors='replace'
  (ferenda/documentrepository.py:1161-1180, soup_from_basefile)
- content selection via ``parse_content_selector`` (default ``body``)
  and removal of ``parse_filter_selectors`` (default ``["script"]``)
  (ferenda/documentrepository.py:1224-1255, defaults :287-295)
- soup -> element-tree conversion policy: drop
  script/style/font/map/center and comments, keep only whitelisted
  attributes, skip pure-whitespace strings, skip unknown tags
  (ferenda/elements/html.py:23-72, elements_from_soup)
- plaintext extraction ``as_plaintext``: normalize whitespace in each
  text child, recurse into element children, join non-empty parts with
  a single space (ferenda/elements/elements.py:233-245)
- ``normalize_space``: NBSP->space, collapse all whitespace runs to a
  single space, strip (ferenda/util.py:279-290)
- fulltext-style extraction ``_extract_plaintext`` with the trailing
  space rule — including the reference's adjacent-string-literal quirk
  ``("a" "b", "i", "span")`` == ("ab","i","span"), so <a> and <b> DO
  get trailing spaces (ferenda/documentrepository.py:2065-2079)

No external deps: stdlib html.parser only (lxml/bs4 are not available
in this environment, and per-document parse must be shippable to
executors with --py-files anyway).
"""

from __future__ import annotations

import codecs
import re
from html.parser import HTMLParser

# --------------------------------------------------------------------------
# tree model

class Node:
    __slots__ = ("tag", "attrs", "children")

    def __init__(self, tag: str, attrs: dict | None = None):
        self.tag = tag
        self.attrs = attrs or {}
        self.children: list = []  # list[Node | str]

    def __repr__(self):  # pragma: no cover - debug aid
        return f"<{self.tag} {self.attrs} n={len(self.children)}>"

    def iter(self):
        # iterative pre-order: recursive `yield from` costs O(depth)
        # frames per node, which dominates tree-walk-heavy selectors
        stack = [self]
        pop, push = stack.pop, stack.extend
        while stack:
            n = pop()
            yield n
            # children reversed so traversal order stays document order
            push(c for c in reversed(n.children) if isinstance(c, Node))


# void elements never take children (HTML5 §13.1.2)
_VOID = frozenset(
    "area base br col embed hr img input link meta param source track wbr".split()
)


class _TreeBuilder(HTMLParser):
    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.root = Node("#document")
        self.stack = [self.root]

    def handle_starttag(self, tag, attrs):
        node = Node(tag, {k: (v if v is not None else "") for k, v in attrs})
        self.stack[-1].children.append(node)
        if tag not in _VOID:
            self.stack.append(node)

    def handle_startendtag(self, tag, attrs):
        self.stack[-1].children.append(
            Node(tag, {k: (v if v is not None else "") for k, v in attrs})
        )

    def handle_endtag(self, tag):
        # pop to the nearest matching open tag; ignore stray end tags
        for i in range(len(self.stack) - 1, 0, -1):
            if self.stack[i].tag == tag:
                del self.stack[i:]
                return

    def handle_data(self, data):
        if data:
            self.stack[-1].children.append(data)

    # comments / declarations / PIs are dropped, mirroring
    # elements_from_soup's bs4.element.Comment skip (elements/html.py:60-62)


def parse_html_stdlib(text: str) -> Node:
    """html.parser-backed tree builder — the behavioral reference twin
    for parse_html (differential-tested in tests/test_htmlparse.py);
    ~2.5x slower than the regex tokenizer below, kept out of the hot
    path."""
    p = _TreeBuilder()
    p.feed(text)
    p.close()
    return p.root


# Fast regex tokenizer (VERDICT r02 #3): tokenizing was ~40% of the
# extract kernel's time under html.parser (its per-char goahead loop +
# updatepos bookkeeping).  This single-regex scan reproduces the
# OBSERVABLE html.parser semantics the tree builder consumes:
# - charrefs converted in data segments (one data child per inter-tag
#   run, like convert_charrefs=True) and in attribute values;
# - script/style switch to CDATA mode: raw text (no charref
#   conversion) until </\s*tag\s*> case-insensitive (parser.py:124);
# - tag/attr names lowercased, unquoted/quoted attr values, valueless
#   attrs -> "" (tree-builder policy), self-closing <x/> not pushed;
# - comments, declarations, CDATA sections and PIs dropped;
# - a '<' that opens no construct is literal text (own child, like
#   parser.py's bogus-'<' path).

_TOKEN_RE = re.compile(r"""<(?:
    !--(?P<comment>.*?)--\s*>   # html.parser closes on '--\s*>'
  | !\[CDATA\[(?P<cdata>.*?)\]\]>
  | !(?!--)(?P<decl>[^>]*)>   # '<!--' w/o '-->' must NOT match as decl
  | \?(?P<pi>[^>]*)>
  | /\s*(?P<end>[a-zA-Z][-.a-zA-Z0-9:_]*)[^>]*>
  | (?P<start>[a-zA-Z][^\t\n\r\f\ />\x00]*)
    (?P<attrs>(?:"[^"]*"|'[^']*'|[^"'>])*)>
)""", re.S | re.X)

# html.parser's attrfind_tolerant (parser.py): name = any run not
# containing whitespace / '/' / '>' ('=' allowed past the first char),
# preceded by a quote/space/slash delimiter; '=+' tolerated; unquoted
# values run to whitespace or '>'
_ATTR_RE = re.compile(
    r"""((?<=['"\s/])[^\s/>][^\s/=>]*)"""
    r"""(?:\s*=+\s*('[^']*'|"[^"]*"|(?!['"])[^>\s]*))?""")

_HAS_AMP_RE = re.compile("&")


class _CdataEnd:
    """Cached per-tag </tag> matchers for script/style raw text."""
    _cache: dict[str, re.Pattern] = {}

    @classmethod
    def get(cls, tag: str) -> re.Pattern:
        p = cls._cache.get(tag)
        if p is None:
            p = re.compile(r"</\s*%s\s*>" % tag, re.I)
            cls._cache[tag] = p
        return p


def parse_html(text: str) -> Node:
    from html import unescape

    root = Node("#document")
    stack = [root]
    pos, n = 0, len(text)
    find_lt = text.find
    while pos < n:
        lt = find_lt("<", pos)
        if lt < 0:
            data = text[pos:]
            if data:
                if _HAS_AMP_RE.search(data):
                    data = unescape(data)
                stack[-1].children.append(data)
            break
        m = _TOKEN_RE.match(text, lt)
        if lt > pos:
            data = text[pos:lt]
            if _HAS_AMP_RE.search(data):
                data = unescape(data)
            stack[-1].children.append(data)
        if m is None:
            nxt = text[lt + 1:lt + 2]
            if not nxt or not ("a" <= nxt <= "z" or "A" <= nxt <= "Z"
                               or nxt in "!/?"):
                # '<' that opens no construct: literal text, own child
                # (html.parser's bogus-'<' path)
                stack[-1].children.append("<")
                pos = lt + 1
                continue
            if text.startswith("</>", lt):
                pos = lt + 3        # consumed silently (end-tag-open)
                continue
            if nxt == "/":
                c2 = text[lt + 2:lt + 3]
                if not ("a" <= c2 <= "z" or "A" <= c2 <= "Z"):
                    k = text.find(">", lt + 2)
                    if k >= 0:      # bogus comment: dropped
                        pos = k + 1
                        continue
            # construct opened but never completed (html.parser's
            # close-time recovery): data through the next '>', else up
            # to the next '<', else just past this '<'
            k = text.find(">", lt + 1)
            if k < 0:
                k = text.find("<", lt + 1)
                k = lt + 1 if k < 0 else k
            else:
                k += 1
            data = text[lt:k]
            if _HAS_AMP_RE.search(data):
                data = unescape(data)
            stack[-1].children.append(data)
            pos = k
            continue
        pos = m.end()
        tag = m.group("start")
        if tag is not None:
            tag = tag.lower()
            rawattrs = m.group("attrs")
            attrs = {}
            if rawattrs:
                last_end = 0
                for am in _ATTR_RE.finditer(rawattrs):
                    k = am.group(1).lower()
                    v = am.group(2)
                    if v is None:
                        v = ""
                    elif v[:1] in "\"'" and v[:1] == v[-1:]:
                        v = v[1:-1]
                    if "&" in v:
                        v = unescape(v)
                    attrs[k] = v     # duplicate attr: last wins, like
                    #                  the dict-of-attrs tree policy
                    last_end = am.end()
                # self-closing only when the trailing '/' is NOT part
                # of an unquoted attribute value (html.parser decides
                # by the char after the parsed attrs)
                selfclose = (rawattrs.endswith("/")
                             and last_end < len(rawattrs))
            else:
                selfclose = False
            node = Node(tag, attrs)
            stack[-1].children.append(node)
            if selfclose or tag in _VOID:
                continue
            if tag in ("script", "style"):
                em = _CdataEnd.get(tag).search(text, pos)
                if em is None:
                    pos = n      # unclosed cdata: dropped, like
                    continue     # html.parser's incomplete-cdata break
                raw = text[pos:em.start()]
                pos = em.end()
                if raw:
                    node.children.append(raw)   # no charref conversion
                continue
            stack.append(node)
        elif (tag := m.group("end")) is not None:
            tag = tag.lower()
            for i in range(len(stack) - 1, 0, -1):
                if stack[i].tag == tag:
                    del stack[i:]
                    break
        # comment / decl / cdata / pi: dropped
    return root


# --------------------------------------------------------------------------
# charset sniff + decode (soup_from_basefile semantics: decode the raw
# bytes with the document's declared/configured encoding, errors='replace')

_CHARSET_RE = re.compile(rb"""charset\s*=\s*["']?([A-Za-z0-9_\-]+)""")


def sniff_charset(data: bytes, default: str = "utf-8") -> str:
    """Declared charset from the first 1024 bytes (<meta charset> or
    http-equiv content-type), else ``default``.  Unknown codec names fall
    back to the default, matching a permissive crawler."""
    m = _CHARSET_RE.search(data[:1024])
    if m:
        name = m.group(1).decode("ascii", "replace")
        try:
            codecs.lookup(name)
            return name
        except LookupError:
            pass
    return default


def decode_html(data: bytes, encoding: str | None = None) -> str:
    """codecs.open(..., encoding, errors='replace') equivalent
    (documentrepository.py:1178)."""
    enc = encoding or sniff_charset(data)
    return data.decode(enc, errors="replace")


# --------------------------------------------------------------------------
# element-tree policy (elements_from_soup, elements/html.py:23-72)

REMOVE_TAGS = frozenset(("script", "style", "font", "map", "center"))
KEEP_ATTRIBUTES = ("class", "id", "dir", "lang", "src", "href", "name", "alt")

# the HTML4/5 tag classes defined in ferenda/elements/html.py:77-646;
# tags outside this map are dropped ("Can't render", html.py:42-44)
TAGMAP = frozenset(
    """html head title body div p h1 h2 h3 h4 h5 h6 ul ol li dl dt dd
    table tr td th thead tbody tfoot caption col colgroup
    a b i u s em strong small mark sub sup span br hr wbr
    pre blockquote q code samp kbd var cite abbr dfn address
    img object param ins del form fieldset legend label input button
    select option optgroup textarea iframe
    article aside details figcaption figure footer header hgroup
    main nav section summary time audio video source track canvas
    datalist embed keygen meter output progress rp rt ruby bdi bdo
    link meta base area noscript tt big strike acronym dir""".split()
)


def clean_tree(node: Node) -> Node | None:
    """elements_from_soup policy over a parsed Node tree."""
    if node.tag in REMOVE_TAGS:
        return None
    if node.tag != "#document" and node.tag not in TAGMAP:
        return None
    out = Node(node.tag, {k: node.attrs[k] for k in KEEP_ATTRIBUTES if k in node.attrs})
    for child in node.children:
        if isinstance(child, str):
            if child.strip() != "":  # ignore pure whitespace between tags
                out.children.append(child)
        else:
            sub = clean_tree(child)
            if sub is not None:
                out.children.append(sub)
    return out


# --------------------------------------------------------------------------
# selection (parse_document_from_soup, documentrepository.py:1224-1255)
# minimal CSS support: 'tag', '.cls', 'tag.cls' — all the reference's
# defaults and its W3C source use (w3c.py:30-31) fit this subset.

def _sel_match(node: Node, selector: str) -> bool:
    if "." in selector:
        tag, cls = selector.split(".", 1)
    else:
        tag, cls = selector, None
    if tag and node.tag != tag:
        return False
    if cls is not None:
        classes = node.attrs.get("class", "").split()
        return cls in classes
    return True


def select(root: Node, selector: str) -> list[Node]:
    # selector parsed once, not per node (_sel_match kept as the
    # single-node spec/test surface)
    if "." in selector:
        tag, cls = selector.split(".", 1)
    else:
        tag, cls = selector, None
    out = []
    for n in root.iter():
        if n is root:
            continue
        if tag and n.tag != tag:
            continue
        if cls is not None and cls not in n.attrs.get("class", "").split():
            continue
        out.append(n)
    return out


def content_select(
    root: Node,
    content_selector: str = "body",
    filter_selectors: tuple[str, ...] = ("script",),
) -> Node | None:
    """First match of content_selector with filter_selectors removed
    (tag.extract() equivalent).  Returns None when nothing matches —
    the reference raises ParseError (documentrepository.py:1245-1247);
    the Spark stage quarantines the row instead."""
    hits = select(root, content_selector)
    if not hits:
        return None
    content = hits[0]
    doomed = set()
    for fs in filter_selectors:
        for n in select(content, fs):
            doomed.add(id(n))
    return _drop(content, doomed)


def _drop(node: Node, doomed: set[int]) -> Node:
    out = Node(node.tag, dict(node.attrs))
    for c in node.children:
        if isinstance(c, str):
            out.children.append(c)
        elif id(c) not in doomed:
            out.children.append(_drop(c, doomed))
    return out


# --------------------------------------------------------------------------
# text extraction

def normalize_space(s: str) -> str:
    """util.normalize_space (util.py:279-290)."""
    return " ".join(s.replace("\xa0", " ").split())


def as_plaintext(node: Node) -> str:
    """CompoundElement.as_plaintext (elements/elements.py:233-245):
    normalize each string child, recurse into element children, join
    the non-empty results with single spaces."""
    res = []
    for sub in node.children:
        if isinstance(sub, str):
            res.append(normalize_space(sub))
        else:
            res.append(as_plaintext(sub))
    return " ".join(filter(None, res))


# NB: the reference writes ("a" "b", "i", "span") — Python concatenates
# the adjacent literals, so the real no-trailing-space set is
# {"ab", "i", "span"}; reproduced verbatim for byte-identical output
# (documentrepository.py:2078).
_NO_TRAILSPACE = frozenset(("ab", "i", "span"))


def extract_plaintext(node: Node) -> str:
    """DocumentRepository._extract_plaintext
    (documentrepository.py:2065-2079): concatenate text, recurse, then
    strip + trailing space for everything but {'ab','i','span'}."""
    plaintext = ""
    for sub in node.children:
        if isinstance(sub, str):
            plaintext += sub
        else:
            plaintext += extract_plaintext(sub)
    trailspace = "" if node.tag in _NO_TRAILSPACE else " "
    return plaintext.strip() + trailspace


# --------------------------------------------------------------------------
# flat columnar projection of the cleaned tree: blocks

def blocks(node: Node, path: str = "") -> list[dict]:
    """DFS flatten: one row per element with its own direct text.
    Replaces the reference's recursive JSON/XHTML serialization of the
    element tree (elements/elements.py:693-932) with a flat
    array<struct<path,tag,text,attrs>> column."""
    rows = []
    own_text = normalize_space(
        " ".join(c for c in node.children if isinstance(c, str))
    )
    rows.append({"path": path or node.tag, "tag": node.tag, "text": own_text,
                 "attrs": dict(node.attrs)})
    idx: dict[str, int] = {}
    for c in node.children:
        if isinstance(c, Node):
            i = idx.get(c.tag, 0)
            idx[c.tag] = i + 1
            rows.extend(blocks(c, f"{path or node.tag}/{c.tag}[{i}]"))
    return rows


# --------------------------------------------------------------------------
# document-level helpers used by the metadata lift

def find_first(root: Node, tag: str) -> Node | None:
    for n in root.iter():
        if n.tag == tag:
            return n
    return None


def doc_lang(root: Node, default: str | None) -> str | None:
    """html/@xml:lang || html/@lang || repo default
    (documentrepository.py:1204-1211)."""
    html = find_first(root, "html")
    if html is not None:
        for key in ("xml:lang", "lang"):
            if key in html.attrs and html.attrs[key]:
                return html.attrs[key]
    return default


def doc_title(root: Node) -> str | None:
    """<title> string (documentrepository.py:1213-1216)."""
    t = find_first(root, "title")
    if t is None:
        return None
    txt = "".join(c for c in t.children if isinstance(c, str))
    return txt if txt else None


def head_meta(root: Node) -> dict[str, str]:
    """<meta name/property=... content=...> pairs from <head> — feeds the
    RDFa/Dublin-Core head lift (cf. parse_metadata_from_soup overrides)."""
    out: dict[str, str] = {}
    head = find_first(root, "head")
    if head is None:
        return out
    for n in head.iter():
        if n.tag == "meta":
            key = n.attrs.get("property") or n.attrs.get("name")
            # NB: 'property' is not in KEEP_ATTRIBUTES; head_meta runs on
            # the RAW tree, before clean_tree.
            if key and "content" in n.attrs:
                out[key] = n.attrs["content"]
    return out
