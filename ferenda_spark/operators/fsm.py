"""FSM-based document structure recovery (SURVEY.md §2 P5/P6/P7).

A configurable finite-state machine with the same observable semantics
as the reference's parser (/root/reference/ferenda/fsmparser.py:13-264):

- *recognizers*: priority-ordered predicates over the peeked chunk;
- *transition table*: (state, recognizer) -> (constructor|False, newstate);
- a state stack; constructors may recurse via ``make_children`` to build
  nested Section/Subsection trees;
- ``(False, newstate)`` pops back to the parent, optionally rewriting the
  state the parent returns to (fsmparser.py:227-236).

This is per-document sequential logic, so in Spark it runs INSIDE the
Arrow-batched extract stage (one FSM run per document, embarrassingly
parallel across url batches — never per-row Python dispatch from the
driver).  The output is columnar: a flat ``sections`` array of
(ordinal, title, kind, parent_ordinal, text) structs per document, from
which fragment URIs and DocumentPart triples are minted with plain
column expressions (operators/triples.py).

Implementation is from scratch; only the *behavior contract* above is
taken from the reference.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field


class FSMError(Exception):
    pass


class _Peek:
    """Minimal one-token-lookahead wrapper (cf. fsmparser.py:240-264)."""

    __slots__ = ("_it", "_buf", "_done")

    def __init__(self, iterable):
        self._it = iter(iterable)
        self._buf = []
        self._done = False

    def peek(self):
        if not self._buf:
            try:
                self._buf.append(next(self._it))
            except StopIteration:
                raise
        return self._buf[0]

    def next(self):
        if self._buf:
            return self._buf.pop(0)
        return next(self._it)

    def at_end(self) -> bool:
        if self._buf:
            return False
        try:
            self.peek()
            return False
        except StopIteration:
            return True


class FSMParser:
    """set_recognizers / set_transitions / parse — reference contract."""

    def __init__(self):
        self.recognizers: tuple = ()
        self.transitions: dict = {}
        self.initial_state = None
        self.initial_constructor = None
        self.reader: _Peek | None = None
        self._stack: list = []

    def set_recognizers(self, *recognizers):
        self.recognizers = recognizers

    def set_transitions(self, table: dict):
        self.transitions = {}
        for (states, recognizer), outcome in table.items():
            if not isinstance(states, (list, tuple)):
                states = [states]
            for s in states:
                self.transitions[(s, recognizer)] = outcome

    def parse(self, chunks):
        self.reader = _Peek(chunks)
        self._stack = [self.initial_state]
        return self.initial_constructor(self)

    # -- internals ---------------------------------------------------------

    def _recognize(self):
        if self.reader.at_end():
            return None
        state = self._stack[-1]
        for rec in self.recognizers:
            if (state, rec) in self.transitions and rec(self):
                return rec
        raise FSMError(
            f"no recognizer matched in state {state!r} "
            f"for chunk {str(self.reader.peek())[:60]!r}"
        )

    def make_child(self, constructor, state):
        """Invoke ``constructor`` under a pushed ``state`` and return its
        element (fsmparser.py make_child: used by list constructors to
        build their first item)."""
        self._stack.append(state)
        try:
            return constructor(self)
        finally:
            self._stack.pop()

    def make_children(self, parent):
        """Fill ``parent`` (a list-like) with children until a (False, _)
        transition pops us out, or input ends.  A transition value may be
        a CALLABLE (symbol, state_stack) -> (constructor, newstate) —
        the reference's dynamic-transition form (fsmparser.py:141-148,
        exercised by its nested-list test grammar)."""
        while True:
            symbol = self._recognize()
            if symbol is None:
                return parent
            outcome = self.transitions[(self._stack[-1], symbol)]
            if callable(outcome) and not isinstance(outcome, tuple):
                outcome = outcome(symbol, self._stack)
            constructor, newstate = outcome
            if constructor is False:
                if newstate:  # rewrite the state we return to
                    if len(self._stack) >= 2:
                        self._stack[-2] = newstate
                return parent
            # in-place state change when the constructor doesn't recurse
            if newstate and not getattr(constructor, "recurses", False):
                self._stack[-1] = newstate
            child_state = newstate or self._stack[-1]
            self._stack.append(child_state)
            try:
                element = constructor(self)
            except StopIteration:
                element = None
            finally:
                self._stack.pop()
            if element is not None:
                parent.append(element)


def recurses(state):
    """Mark a constructor as recursing via make_children under ``state``
    (the reference's @newstate decorator, decorators.py)."""

    def deco(fn):
        fn.recurses = True
        fn.newstate = state
        return fn

    return deco


# ---------------------------------------------------------------------------
# Output element model — minimal list-based tree, flattened to rows.

@dataclass
class Elem(list):
    kind: str = "body"
    ordinal: str | None = None
    title: str | None = None
    lines: list = field(default_factory=list)  # own text chunks


def flatten_sections(body: Elem) -> list[dict]:
    """Flat rows (kind, ordinal, title, parent_ordinal, text) — DFS order.
    Preamble sections get synthetic ordinals PS1, PS2, ... (cf.
    FIXTURES.md §4 / elements.py PreambleSection)."""
    rows: list[dict] = []
    ps_count = 0

    def walk(node, parent_ord):
        nonlocal ps_count
        for child in node:
            if isinstance(child, str):
                continue
            ordinal = child.ordinal
            if child.kind == "preamblesection":
                ps_count += 1
                ordinal = f"PS{ps_count}"
            own_text = " ".join(
                t for t in child if isinstance(t, str) and t.strip()
            )
            rows.append(
                {
                    "kind": child.kind,
                    "ordinal": ordinal,
                    "title": child.title,
                    "parent_ordinal": parent_ord,
                    "text": own_text,
                }
            )
            walk(child, ordinal)

    walk(body, None)
    return rows


# ---------------------------------------------------------------------------
# W3C-style parser instance (reference: sources/tech/w3c.py:84-207):
# re-nests a flat h1-h4 + paragraph flow into Section/Subsection/
# Subsubsection by numeric ordinal, with named preamble sections.

_SECTIONSTART = re.compile(r"^(\d[\.\d]*) +(.*[^\.])$").match
_PREAMBLE_TITLES = ("abstract", "status of this document",
                    "table of contents", "appendices")


def analyze_sectionstart(text: str):
    m = _SECTIONSTART(text)
    if m:
        return m.group(1).rstrip("."), m.group(2)
    return None, text


def _seg_count(ordinal):
    return (ordinal is not None) and len([s for s in ordinal.split(".") if s])


def w3c_parser() -> FSMParser:
    """Chunks are (tag, text) pairs: tag in h1..h4 marks headers."""

    def is_header(p):
        tag, _ = p.reader.peek()
        return tag in ("h1", "h2", "h3", "h4")

    def is_preamblesection(p):
        if not is_header(p):
            return False
        _, text = p.reader.peek()
        return text.lower() in _PREAMBLE_TITLES

    def is_section(p):
        if not is_header(p):
            return False
        _, text = p.reader.peek()
        return _seg_count(analyze_sectionstart(text)[0]) == 1

    def is_subsection(p):
        if not is_header(p):
            return False
        _, text = p.reader.peek()
        return _seg_count(analyze_sectionstart(text)[0]) == 2

    def is_subsubsection(p):
        if not is_header(p):
            return False
        _, text = p.reader.peek()
        return _seg_count(analyze_sectionstart(text)[0]) == 3

    def is_other(p):
        return True

    def make_other(p):
        return p.reader.next()[1]

    @recurses("preamblesection")
    def make_preamble(p):
        _, text = p.reader.next()
        return p.make_children(Elem(kind="preamblesection", title=text))

    def _make_sec(kind):
        @recurses(kind)
        def make(p):
            _, text = p.reader.next()
            ordinal, title = analyze_sectionstart(text)
            return p.make_children(Elem(kind=kind, ordinal=ordinal, title=title))

        return make

    make_section = _make_sec("section")
    make_subsection = _make_sec("subsection")
    make_subsubsection = _make_sec("subsubsection")

    @recurses("body")
    def make_body(p):
        return p.make_children(Elem(kind="body"))

    p = FSMParser()
    p.set_recognizers(is_section, is_subsection, is_subsubsection,
                      is_preamblesection, is_header, is_other)
    common = ("body", "preamblesection", "section", "subsection", "subsubsection")
    p.set_transitions({
        ("body", is_preamblesection): (make_preamble, "preamblesection"),
        ("preamblesection", is_preamblesection): (False, None),
        ("preamblesection", is_section): (False, None),
        ("body", is_section): (make_section, "section"),
        (common, is_other): (None, None),  # placeholder replaced below
        ("section", is_subsection): (make_subsection, "subsection"),
        ("section", is_section): (False, None),
        ("subsection", is_subsubsection): (make_subsubsection, "subsubsection"),
        ("subsection", is_subsection): (False, None),
        ("subsection", is_section): (False, None),
        ("subsubsection", is_subsubsection): (False, None),
        ("subsubsection", is_subsection): (False, None),
        ("subsubsection", is_section): (False, None),
    })
    # fix the placeholder (can't reference make_other before definition order)
    for s in common:
        p.transitions[(s, is_other)] = (make_other, None)
    p.initial_state = "body"
    p.initial_constructor = make_body
    return p


def w3c_structure(header_chunks: list[tuple[str, str]]) -> list[dict]:
    """Parse (tag,text) chunks; return flat section rows."""
    if not header_chunks:
        return []
    body = w3c_parser().parse(header_chunks)
    return flatten_sections(body)


# The RFC-style parser instance lives in operators/rfc_parse.py: the
# full reference transition table (rfc.py:132-427) on this FSMParser,
# golden-gated against the reference's own distilled fixtures
# (tests/test_reference_parity.py).
