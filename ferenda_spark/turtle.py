"""Minimal Turtle reader for the *simple* subset the reference's
committed fixtures use (/root/reference/test/files/repo/*/distilled/*.ttl
and ferenda/sources/tech/res/extra/*.ttl): @prefix directives, URI and
prefixed-name subjects/predicates, `a`, URI / plain / @lang / ^^typed
literal objects, `,` object lists, `;` predicate lists, `.` terminators.

Written so the reference's own golden RDF graphs can be compared against
the engine's triple output WITHOUT rdflib (not installed here).  It is a
fixture-grade parser, not a general Turtle implementation: blank nodes,
collections, multi-line literals and numeric literals are out of scope
(none appear in the fixtures; a count assertion in the parity test
guards against silent under-parsing).
"""

from __future__ import annotations

import re

_PREFIX_RE = re.compile(r"@prefix\s+([A-Za-z][\w-]*)?:\s+<([^>]*)>\s*\.")

# one "token" of the body: uri, quoted literal (with escapes), prefixed
# name, `a`, or punctuation
_TOKEN_RE = re.compile(
    r"""<[^>]*>              # <uri>
      | "(?:[^"\\]|\\.)*"    # "literal"
          (?:@[\w-]+|\^\^[^\s,;.]+)?   # optional @lang or ^^datatype
      | [A-Za-z][\w-]*:[^\s,;.]*       # prefixed name
      | \ba\b
      | [,;.]
    """,
    re.VERBOSE,
)

_ESCAPES = {"n": "\n", "t": "\t", "r": "\r", '"': '"', "\\": "\\"}


def _unescape(s: str) -> str:
    return re.sub(r"\\(.)", lambda m: _ESCAPES.get(m.group(1), m.group(1)), s)


def _strip_comments(text: str) -> str:
    out = []
    for line in text.split("\n"):
        # '#' starts a comment unless inside a quoted literal or <uri>
        in_q = False
        in_uri = False
        for i, ch in enumerate(line):
            if ch == '"' and (i == 0 or line[i - 1] != "\\"):
                in_q = not in_q
            elif ch == "<" and not in_q:
                in_uri = True
            elif ch == ">" and not in_q:
                in_uri = False
            elif ch == "#" and not in_q and not in_uri:
                # fragment URIs (<...#S1>) handled by in_uri; prefixed
                # names never contain '#'
                line = line[:i]
                break
        out.append(line)
    return "\n".join(out)


def parse_turtle(text: str) -> list[dict]:
    """Parse into rows {subj, pred, obj, obj_is_uri, obj_lang,
    obj_datatype} with full URIs."""
    prefixes: dict[str, str] = {}
    for m in _PREFIX_RE.finditer(text):
        prefixes[m.group(1) or ""] = m.group(2)
    body = _PREFIX_RE.sub(" ", _strip_comments(text))

    def resolve(tok: str):
        """-> (value, is_uri, lang, datatype)"""
        if tok.startswith("<"):
            return tok[1:-1], True, None, None
        if tok.startswith('"'):
            m = re.match(r'^"((?:[^"\\]|\\.)*)"(?:@([\w-]+)|\^\^(\S+))?$', tok)
            lit = _unescape(m.group(1))
            dtype = None
            if m.group(3):
                d = m.group(3)
                dtype = (d[1:-1] if d.startswith("<")
                         else prefixes[d.split(":")[0]] + d.split(":", 1)[1])
            return lit, False, m.group(2), dtype
        if tok == "a":
            return "http://www.w3.org/1999/02/22-rdf-syntax-ns#type", True, None, None
        pfx, local = tok.split(":", 1)
        return prefixes[pfx] + local, True, None, None

    rows: list[dict] = []
    subj = pred = None
    expect = "subj"
    for m in _TOKEN_RE.finditer(body):
        tok = m.group(0)
        if tok == ".":
            subj = pred = None
            expect = "subj"
        elif tok == ";":
            expect = "pred"
        elif tok == ",":
            expect = "obj"
        elif expect == "subj":
            subj = resolve(tok)[0]
            expect = "pred"
        elif expect == "pred":
            pred = resolve(tok)[0]
            expect = "obj"
        else:
            val, is_uri, lang, dtype = resolve(tok)
            rows.append({"subj": subj, "pred": pred, "obj": val,
                         "obj_is_uri": is_uri, "obj_lang": lang,
                         "obj_datatype": dtype})
            expect = "obj"  # until , ; or . says otherwise
    return rows


def commondata_rows_from_turtle(text: str,
                                label_preds: tuple[str, ...] = (
                                    "http://xmlns.com/foaf/0.1/name",
                                    "http://purl.org/ontology/bibo/identifier",
                                )) -> list[dict]:
    """(uri, label, pred) rows for the J1 entity dictionary, from an
    extra/*.ttl graph (documentrepository.py:406-436 commondata)."""
    return [{"uri": r["subj"], "label": r["obj"], "pred": r["pred"]}
            for r in parse_turtle(text)
            if r["pred"] in label_preds and not r["obj_is_uri"]]
