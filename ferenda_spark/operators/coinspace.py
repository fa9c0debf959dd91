"""COIN URISpace: load a full coin:URISpace definition (the reference's
swedishlegalsource.space.ttl + slugs.ttl) and mint URIs for resource
descriptions — the configuration-driven superset of the static-template
compile_coin path (operators/coin.py).

Semantics from the documented COIN contract
(/root/reference/ferenda/thirdparty/coin.py:14-229), re-implemented
from scratch and validated against the reference's committed
integration goldens (test/files/legaluri/publ.atom: each entry is a
resource description + its expected URI; integrationLegalURI.py
Coinstruct):

- template order (priority desc, has-forType, #bindings desc);
- binding match: property (with alternatives), optional variable name,
  slugFrom indirection through the slugs graph;
- slug transform: ToBaseChar (diacritic folding) + ToLowerCase +
  replace pairs + space replacement;
- base resolution: space base, relToBase (the URI of a related
  resource — itself recursively minted when not already a URI in the
  space), relFromBase (the inverse: the resource that points HERE);
- fragmentTemplate on an already-fragmented base uses the space's
  fragmentSeparator.

This is the per-document kernel twin; the columnar engine path is
compile_coin (whose templates a space like this compiles down to when
the resource rows are flat).
"""

from __future__ import annotations

import re
import unicodedata

PREFIXES = {
    "": "http://rinfo.lagrummet.se/sys/uri/space#",
    "coin": "http://purl.org/court/def/2009/coin#",
    "dct": "http://purl.org/dc/terms/",
    "foaf": "http://xmlns.com/foaf/0.1/",
    "rdf": "http://www.w3.org/1999/02/22-rdf-syntax-ns#",
    "rdfs": "http://www.w3.org/2000/01/rdf-schema#",
    "rpubl": "http://rinfo.lagrummet.se/ns/2008/11/rinfo/publ#",
    "xsd": "http://www.w3.org/2001/XMLSchema#",
}


def expand(qname: str) -> str:
    if qname.startswith("<"):
        return qname[1:-1]
    if ":" not in qname:
        return qname        # plain literal token (numbers, 'a', ...)
    pfx, _, local = qname.partition(":")
    return PREFIXES.get(pfx, pfx + ":") + local


# --------------------------------------------------------------------------
# bespoke structural parser for the space file (bracket-nested Turtle
# subset: exactly what coin URISpace definitions use)

_TOKEN = re.compile(r'"(?:[^"\\]|\\.)*"|[\[\];,]|[^\s\[\];,]+')


def _tokens(text: str):
    # strip comments
    lines = []
    for line in text.split("\n"):
        if line.lstrip().startswith("#"):
            continue
        lines.append(line)
    return _TOKEN.findall("\n".join(lines))


def _parse_group(toks: list[str], i: int):
    """Parse '[ pred obj(, obj)* (; pred obj...)* ]' -> (dict, next_i).
    Values: strings, nested dicts, or lists when repeated/comma'd."""
    assert toks[i] == "["
    i += 1
    out: dict = {}
    pred = None
    while i < len(toks):
        t = toks[i]
        if t == "]":
            return out, i + 1
        if t == ";":
            pred = None
            i += 1
            continue
        if t == ",":
            i += 1
            continue
        if pred is None:
            pred = expand(t)
            i += 1
            continue
        if t == "[":
            val, i = _parse_group(toks, i)
        else:
            val = t[1:-1] if t.startswith('"') else expand(t)
            i += 1
        out.setdefault(pred, []).append(val)
    raise ValueError("unterminated group")


def parse_space(ttl: str) -> dict:
    toks = _tokens(ttl)
    # find the URISpace subject block: ': a coin:URISpace ; ...'
    space: dict = {}
    i = toks.index("coin:URISpace") + 1
    pred = None
    while i < len(toks):
        t = toks[i]
        if t == ".":
            break
        if t == ";":
            pred = None
            i += 1
            continue
        if t == ",":
            i += 1
            continue
        if pred is None:
            pred = expand(t)
            i += 1
            continue
        if t == "[":
            val, i = _parse_group(toks, i)
        else:
            val = t[1:-1] if t.startswith('"') else expand(t)
            i += 1
        space.setdefault(pred, []).append(val)
    return space


def parse_slugs(ttl: str) -> dict[str, str]:
    out: dict[str, str] = {}
    for m in re.finditer(
            r'(<[^>]+>|\S+:\S+)\s+\w*:abbrSlug\s+"([^"]+)"', ttl):
        out[expand(m.group(1))] = m.group(2)
    return out


# --------------------------------------------------------------------------

COIN = PREFIXES["coin"]


class URISpace:
    def __init__(self, space_ttl: str, slugs_ttl: str = ""):
        cfg = parse_space(space_ttl)
        self.base = cfg[COIN + "base"][0]
        self.frag_sep = cfg.get(COIN + "fragmentSeparator", ["-"])[0]
        st = cfg.get(COIN + "slugTransform", [{}])[0]
        self.slug_apply = st.get(COIN + "apply", [])
        self.slug_replace = [tuple(s.split(" ", 1))
                             for s in st.get(COIN + "replace", [])]
        self.space_repl = st.get(COIN + "spaceReplacement", [" "])[0]
        self.slugs = parse_slugs(slugs_ttl)
        self.templates = sorted(
            cfg.get(COIN + "template", []),
            key=lambda t: (int(t.get(COIN + "priority", ["0"])[0]),
                           COIN + "forType" in t,
                           len(t.get(COIN + "binding", []))),
            reverse=True)

    # -- slug transform (coin.py:60-91) ------------------------------------
    def transform_value(self, value: str) -> str:
        out = value
        if COIN + "ToBaseChar" in self.slug_apply:
            # replace pairs run over the original chars FIRST (å->aa
            # etc.), the remaining diacritics fold to base characters
            for a, b in self.slug_replace:
                out = out.replace(a, b)
            out = "".join(c for c in unicodedata.normalize("NFKD", out)
                          if not unicodedata.combining(c))
        if COIN + "ToLowerCase" in self.slug_apply:
            out = out.lower()
        out = out.replace(" ", self.space_repl)
        return out

    # -- minting (coin.py:127-197) -----------------------------------------
    def coin_uri(self, resource: dict) -> str | None:
        """resource: {'type': uri, 'props': {pred_uri: [values]},
        'parent': (parent_resource, pred_uri) | None}.  Values are
        strings (literals or URIs) or nested resource dicts."""
        for tmpl in self.templates:
            uri = self._try_template(tmpl, resource)
            if uri is not None:
                return uri
        return None

    def _value(self, resource: dict, pred: str):
        if pred == PREFIXES["rdf"] + "type":
            return resource.get("type")
        vals = resource["props"].get(pred)
        return vals[0] if vals else None

    def _try_template(self, tmpl: dict, resource: dict) -> str | None:
        for_type = tmpl.get(COIN + "forType")
        if for_type and resource.get("type") not in for_type:
            return None
        matches: dict[str, str] = {}
        for b in tmpl.get(COIN + "binding", []):
            props = b.get(COIN + "property", [])
            var = b.get(COIN + "variable",
                        [props[0].rsplit("#")[-1].rsplit("/")[-1]])[0]
            value = None
            for prop in props:
                value = self._value(resource, prop)
                if value is not None:
                    break
            if value is None:
                return None
            if COIN + "slugFrom" in b:
                slug_pred = b[COIN + "slugFrom"][0]
                if isinstance(value, dict):   # nested resource
                    value = (self._value(value, slug_pred)
                             or self.slugs.get(value.get("uri", "")))
                else:                          # URI reference
                    value = self.slugs.get(value)
                if value is None:
                    return None
            if isinstance(value, dict):
                return None
            # coin:match guard compares against the (slug-resolved)
            # value (coin.py:222-226 find_match)
            if COIN + "match" in b and value != b[COIN + "match"][0]:
                return None
            matches[var] = value
        base = self._get_base(tmpl, resource)
        if base is None:
            return None
        return self._build(tmpl, base, matches)

    def _get_base(self, tmpl: dict, resource: dict) -> str | None:
        rel_to = tmpl.get(COIN + "relToBase")
        rel_from = tmpl.get(COIN + "relFromBase")
        if rel_to:
            val = self._value(resource, rel_to[0])
            return self._guarded_base(val)
        if rel_from:
            parent = resource.get("parent")
            if parent and parent[1] == rel_from[0]:
                return self._guarded_base(parent[0])
            return None
        return self.base

    def _guarded_base(self, val) -> str | None:
        if val is None:
            return None
        if isinstance(val, str):
            return val if val.startswith(self.base) else None
        # a nested resource description: mint it recursively
        return self.coin_uri(val)

    def _build(self, tmpl: dict, base: str, matches: dict) -> str | None:
        uri_t = tmpl.get(COIN + "uriTemplate", [None])[0]
        frag_t = tmpl.get(COIN + "fragmentTemplate", [None])[0]
        if uri_t:
            expanded = uri_t
        elif frag_t:
            base = base + (self.frag_sep if "#" in base else "#")
            expanded = base + frag_t
        else:
            return None
        expanded = expanded.replace("{+base}", base)
        for var, value in matches.items():
            expanded = expanded.replace("{%s}" % var,
                                        self.transform_value(value))
        if expanded.startswith("/"):
            expanded = expanded[1:]
        if expanded.startswith("http://") or expanded.startswith("https://"):
            return expanded
        return f"{base}/{expanded}"
