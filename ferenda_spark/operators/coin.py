"""COIN URI minting as a pure columnar function (SURVEY.md §2 C7).

The reference's coin.py (/root/reference/ferenda/thirdparty/coin.py:14-229)
mints deterministic URIs from RDF property values via an ordered list of
templates.  Semantics reproduced:

- template order: (priority desc, has-forType first, #bindings desc)
  (coin.py:39-40);
- a template matches iff its ``forType`` (when set) equals the row's
  rdf:type AND every binding variable has a non-null (resolved) value
  (coin.py:127-142);
- each bound value passes the slug transform: lowercase -> char
  replacements -> whitespace -> space_replacement (default '+') ->
  strip pattern (coin.py:60-91);
- ``{var}`` substitution into uriTemplate / fragmentTemplate, with
  ``{+base}`` expanding un-encoded (coin.py:144-174);
- ``relToBase``: the template's base is the URI of a RELATED resource
  rather than the space base (coin.py:176-197 get_base) — columnar
  twin: the base comes from a column (produced by a pre-join or a
  previous minting pass), guarded to the space's URI prefix;
- ``fragmentTemplate`` without uriTemplate: base + '#' + fragment
  (coin.py:148-154);
- per-binding ``slugFrom`` indirection: the binding value is a resource
  whose slug lives under another property (coin.py:203-229 find_match)
  — columnar twin: resolve the value through a literal-map dictionary
  (the space graph's slug database) before slugging; unresolved ->
  binding unmatched;
- per-binding ``match`` guard: the raw value must equal a constant.

Because the template set is small static config, the whole dispatch
compiles to ONE ordered ``when()`` chain of string expressions —
no UDF, no shuffle, fully inside whole-stage codegen.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import Column
from pyspark.sql import functions as F


@dataclass(frozen=True)
class SlugTransform:
    """coin.py:60-91 defaults."""
    to_lower: bool = True
    replace: tuple = ()          # ((from_char, to_char), ...)
    space_repl: str = "+"
    strip_pattern: str = ""      # regex of chars to remove

    def apply(self, col: Column) -> Column:
        from ferenda_spark.functions.scalars import WS_CLASS
        out = F.lower(col) if self.to_lower else col
        for a, b in self.replace:
            out = F.replace(out, F.lit(a), F.lit(b))
        # WS_CLASS, not \s: Java \s is ASCII-only, Python's is not —
        # the explicit class keeps both implementations identical
        out = F.regexp_replace(out, WS_CLASS + "+",
                               self.space_repl.replace("\\", "\\\\"))
        if self.strip_pattern:
            out = F.regexp_replace(out, self.strip_pattern, "")
        return out

    def apply_py(self, value: str) -> str:
        """Pure-Python twin, used by fixture/golden generation and tests."""
        from ferenda_spark.functions.scalars import WS_CLASS
        out = value.lower() if self.to_lower else value
        for a, b in self.replace:
            out = out.replace(a, b)
        out = re.sub(WS_CLASS + "+", self.space_repl, out)
        if self.strip_pattern:
            out = re.sub(self.strip_pattern, "", out)
        return out


@dataclass(frozen=True)
class CoinBinding:
    """One COIN binding (coin.py:201-229): a variable, an optional
    constant ``match`` guard, and an optional ``slug_from`` literal
    dictionary (the columnar form of slugFrom indirection — the space
    graph's slug statements compiled to a map expression)."""
    variable: str
    match: str | None = None
    slug_from: tuple = ()        # ((raw_value, slug), ...)


@dataclass(frozen=True)
class CoinTemplate:
    uri_template: str | None = None        # may contain {+base} and {var}
    bindings: tuple = ()                   # names or CoinBinding objects
    for_type: str | None = None            # rdf:type guard
    priority: int = 0
    fragment_template: str | None = None   # appended as '#' + template
    slug: SlugTransform = field(default_factory=SlugTransform)
    rel_to_base: str | None = None         # column holding the related
    #                                        resource's URI (get_base)

    def __post_init__(self):
        assert self.uri_template or self.fragment_template, \
            "No template for template"  # coin.py:117


_VAR_RE = re.compile(r"\{(\+?[A-Za-z_][A-Za-z0-9_]*)\}")


def _template_order(t: CoinTemplate):
    # coin.py:39-40: sorted(templates, key=..., reverse=True) on
    # (priority, bool(forType), len(bindings))
    return (t.priority, t.for_type is not None, len(t.bindings))


def _as_binding(b) -> CoinBinding:
    return b if isinstance(b, CoinBinding) else CoinBinding(variable=b)


def _render(template: str, base: Column, cols: dict[str, Column],
            slug: SlugTransform) -> Column:
    parts: list[Column] = []
    pos = 0
    for m in _VAR_RE.finditer(template):
        if m.start() > pos:
            parts.append(F.lit(template[pos:m.start()]))
        var = m.group(1)
        if var == "+base":
            parts.append(base)
        else:
            parts.append(slug.apply(cols[var].cast("string")))
        pos = m.end()
    if pos < len(template):
        parts.append(F.lit(template[pos:]))
    if not parts:
        return F.lit("")
    return F.concat(*parts)


def compile_coin(templates: list[CoinTemplate], base: str,
                 cols: dict[str, Column],
                 rdf_type: Column | None = None) -> Column:
    """Ordered when()-chain minting a URI column; null when no template
    matches (the reference raises — callers quarantine instead)."""
    ordered = sorted(templates, key=_template_order, reverse=True)
    result: Column | None = None
    for t in ordered:
        cond = F.lit(True)
        # resolve binding values (slugFrom indirection + match guards)
        resolved = dict(cols)
        for b in map(_as_binding, t.bindings):
            raw = cols[b.variable]
            if b.slug_from:
                flat = []
                for k, v in b.slug_from:
                    flat += [F.lit(k), F.lit(v)]
                resolved[b.variable] = F.element_at(F.create_map(*flat),
                                                    raw.cast("string"))
            if b.match is not None:
                cond = cond & (raw == F.lit(b.match))
            cond = cond & resolved[b.variable].isNotNull()
        if t.for_type is not None:
            guard = rdf_type if rdf_type is not None else F.lit(None)
            cond = cond & (guard == F.lit(t.for_type))
        # get_base (coin.py:176-197): space base, or a related
        # resource's URI guarded to the space prefix
        if t.rel_to_base is not None:
            base_col = cols[t.rel_to_base]
            cond = cond & base_col.isNotNull() \
                & base_col.startswith(base)
        else:
            base_col = F.lit(base)
        if t.uri_template:
            uri = _render(t.uri_template, base_col, resolved, t.slug)
            if t.fragment_template:
                frag = _render(t.fragment_template, base_col, resolved,
                               t.slug)
                uri = F.concat(uri, F.lit("#"), frag)
        else:
            # fragmentTemplate-only: base + '#' + fragment (coin.py:148-154)
            frag = _render(t.fragment_template, base_col, resolved, t.slug)
            uri = F.concat(base_col, F.lit("#"), frag)
        result = F.when(cond, uri) if result is None else result.when(cond, uri)
    return result if result is not None else F.lit(None).cast("string")
