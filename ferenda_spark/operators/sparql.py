"""SPARQL -> DataFrame compiler: the engine-native counterpart of
the reference's triplestore query surface.

The reference answers annotation/describe queries by POSTing SPARQL to
an external triplestore (``construct_annotations`` ->
``TripleStore.construct``, /root/reference/ferenda/documentrepository.py:
2471-2488, template /root/reference/ferenda/res/sparql/annotations.rq)
and ships per-repo query templates.  Here the triple table IS a
DataFrame, so the same queries compile to a Catalyst join plan instead
of leaving the engine.

Supported subset — everything the reference's 17 shipped ``.rq``
templates use (res/sparql/*.rq across ferenda core, tech, legal/se,
general, and lagen.nu), plus the common SELECT forms:

* ``PREFIX`` declarations, ``a`` for rdf:type
* ``SELECT ?v ... WHERE { ... }`` (incl. ``*``), ``DISTINCT``,
  ``ORDER BY``, ``LIMIT``, ``OFFSET``
* aggregates ``(COUNT([DISTINCT] ?v|*) AS ?n)`` / SUM / MIN / MAX /
  AVG / SAMPLE / ``GROUP_CONCAT(?v; SEPARATOR="...")`` with
  ``GROUP BY`` -> groupBy().agg() (map-side partial aggregation for
  free) and ``HAVING`` over the aggregate aliases (GROUP_CONCAT sorts
  its values — SPARQL leaves the order unspecified, a deterministic
  result is oracle-comparable)
* ``CONSTRUCT { template } WHERE { ... }`` -> a (subj, pred, obj)
  DataFrame (one union branch per template pattern); the
  ``CONSTRUCT WHERE { ... }`` shorthand for plain-pattern groups
* ``ASK { ... }`` -> one boolean ``answer`` row;
  ``DESCRIBE <uri>... [?v...] [WHERE { ... }]`` -> the targets'
  outbound + inbound triples (variable targets resolved from the
  WHERE solution via semi joins, never a driver collect)
* basic graph patterns joined on shared variables, with
  predicate-object lists (``;``) and object lists (``,``)
* ``OPTIONAL { ... }`` -> left outer join
* ``{ ... } UNION { ... } UNION { ... }`` (n-ary) -> unionByName with
  null-padded unbound vars; a braced group NOT followed by UNION is
  merged into its parent (group nesting)
* ``GRAPH <iri> { ... }`` -> transparent: the engine is a
  single-graph store, the DataFrame handed in IS the named dataset
  (the reference parameterizes ``%(context)s`` per repo the same way)
* ``BIND(expr AS ?v)`` -> withColumn at the group's position
* ``FILTER [NOT] EXISTS { ... }`` -> left semi / left anti join on the
  shared variables (must be correlated); ``MINUS { ... }`` -> left
  anti join, and per SPARQL spec a MINUS sharing no variable with the
  outer group removes nothing
* ``VALUES ?x { ... }`` / ``VALUES (?x ?y) { (a b) ... }`` -> inline
  literal DataFrame joined into the solution (UNDEF not supported)
* subqueries ``{ SELECT ... WHERE { ... } GROUP BY ... }`` -> the
  inner SELECT compiles to its own (projected) solution DataFrame and
  joins the outer group on the shared variables
* ``FILTER (...)`` with the full expression grammar the templates
  use: ``= != < <= > >= && || !``, parentheses, ``?x IN (iri, ...)``,
  ``regex(?v,"re")``, ``bound(?v)``, ``str(x)``, ``STRSTARTS/STRENDS/
  CONTAINS(a, b)`` (either argument an expression), ``LCASE/UCASE/
  STRLEN``, ``isURI/isIRI/isLiteral(?v)`` — URI-ness is exact, read
  from the triple schema's ``obj_is_uri`` flag (operators/triples.py
  TRIPLES_COLS), not guessed from the string — and ``lang(?v)`` /
  ``langMatches(lang(?v), "tag"|"*")`` read the same way from the
  schema's ``obj_lang`` column (RFC 4647 basic filtering: exact
  primary tag or ``tag-`` prefix, ``*`` = any tagged literal) — plus
  ``CONCAT``, ``COALESCE``, ``IF``, ``SUBSTR`` (1-based),
  regex-based ``REPLACE``, spec-faithful ``STRBEFORE`` /
  ``STRAFTER`` ('' when the needle is absent), ``IRI()/URI()``,
  ``sameTerm``, ``isBlank``, arithmetic ``+ - * /`` with the usual
  precedence, and ``xsd:`` constructor casts compiled as
  ``try_cast`` (a SPARQL type error is NULL -> filter-false, never
  an ANSI runtime abort on dirty data)
* property paths: quantifiers ``p*`` / ``p+`` / ``p?`` / ``p{m,n}``
  (e.g. the reference's ``dcterms:isPartOf{,1}`` in
  prop-annotations.rq), sequence ``p1/p2``, inverse ``^p``,
  alternation ``p1|p2``, negated property sets ``!p`` / ``!(p1|p2)``
  (forward members only) and parenthesized combinations with
  quantifiers — bounded closure, default depth 3 for the unbounded
  forms (the reference's part trees nest S / S.1 / S.1.1, same bound
  as operators/canonicalize.annotation_closure).  Zero-length paths
  range over the nodes of the path's own edge subgraph (documented
  deviation from the spec's all-terms domain)

Spark shape / scale notes:

* Each triple pattern is a FILTERED SCAN of the triples table — its
  constant terms (pred almost always, often subj or obj too) become
  pushed-down predicates, so at 100 TB a pattern touches only its
  pred_bucket partitions.
* Patterns are joined GREEDILY in selectivity order (most bound
  constants first), always preferring a pattern that shares a variable
  with the solution built so far — a cartesian product only happens if
  the query itself is disconnected.
* A pattern bound by 2+ constants is a needle in the table => its scan
  is broadcast-hinted into the join.
* ``p*``/``p+``/``p{m,n}`` closures are chained self-joins of the
  edge subset (one pred-filtered scan reused), not a driver loop over
  collected rows.
* The ``obj_is_uri`` shadow columns that power isURI/isLiteral are
  only materialized when the query actually uses those functions, so
  the common case pays nothing.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_TOKEN_RE = re.compile(
    r"""\s*(?:
      (?P<comment>\#[^\n]*)
    | (?P<iri><[^>\s]*>)
    | (?P<var>\?[A-Za-z_][A-Za-z0-9_]*)
    | (?P<lit>"(?:[^"\\]|\\.)*")
    | (?P<num>-?\d+(?:\.\d+)?)
    | (?P<pname>[A-Za-z_][A-Za-z0-9_-]*:
        (?:[A-Za-z0-9_%-]|\.(?=[A-Za-z0-9_%-]))*)   # dot only mid-name,
                                 # so 'dcterms:title .' keeps the period
    | (?P<kw>(?:PREFIX|SELECT|CONSTRUCT|DESCRIBE|ASK|WHERE|OPTIONAL|UNION
        |FILTER|BIND|GRAPH|DISTINCT|ORDER|BY|LIMIT|OFFSET|ASC|DESC|a)
        (?![A-Za-z0-9_]))
    | (?P<ident>[A-Za-z_][A-Za-z0-9_]*)   # FILTER function names, AS, IN
    | (?P<punct>&&|\|\||!=|<=|>=|[{}().;,*+=<>!/^?|-])
    )""",
    re.X | re.I)

RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
_SHADOW = "__isuri__"       # prefix of the per-var URI-ness shadow column
_LANG_SHADOW = "__lang__"   # prefix of the per-var language-tag column
_SHADOW_PREFIXES = (_SHADOW, _LANG_SHADOW)


def _is_shadow(c: str) -> bool:
    return c.startswith(_SHADOW_PREFIXES)


def _tokenize(q: str) -> list[str]:
    toks, pos = [], 0
    while pos < len(q):
        m = _TOKEN_RE.match(q, pos)
        if not m:
            if q[pos:].strip():
                raise ValueError(f"sparql: cannot tokenize at {q[pos:pos+30]!r}")
            break
        pos = m.end()
        if m.lastgroup != "comment":
            toks.append(m.group(m.lastgroup))
    return toks


@dataclass
class Term:
    kind: str   # var | iri | lit
    value: str


@dataclass
class Pattern:
    s: Term
    p: Term     # kind 'iri'/'var', or 'path' with value = a PathAlt
    o: Term
    path: tuple[int, int | None] | None = None  # (min, max); max None = default


@dataclass
class PathElt:
    """One path element: a predicate IRI, a parenthesized
    subexpression, or a negated property set — optionally inverted
    and/or quantified."""
    iri: str | None = None
    inverse: bool = False
    quant: tuple[int, int | None] | None = None
    group: "PathAlt | None" = None
    neg: list | None = None   # !(iri|...) — forward members only


@dataclass
class PathSeq:
    elts: list    # [PathElt]


@dataclass
class PathAlt:
    seqs: list    # [PathSeq]


@dataclass
class Group:
    patterns: list = field(default_factory=list)   # [Pattern]
    optionals: list = field(default_factory=list)  # [Group]
    unions: list = field(default_factory=list)     # [[Group, Group, ...]]
    filters: list = field(default_factory=list)    # [token list]
    binds: list = field(default_factory=list)      # [(expr tokens, varname)]
    exists: list = field(default_factory=list)     # [(positive, Group)]
    minuses: list = field(default_factory=list)    # [Group]
    values: list = field(default_factory=list)     # [(varnames, rows)]
    subselects: list = field(default_factory=list)  # [Query]


@dataclass
class Agg:
    func: str        # count | sum | min | max | avg | sample | group_concat
    var: str | None  # None = COUNT(*)
    alias: str
    distinct: bool = False
    sep: str = " "   # GROUP_CONCAT separator


@dataclass
class Query:
    form: str                 # select | construct | ask | describe
    select_vars: list[str]    # [] means *
    distinct: bool
    template: list[Pattern]   # construct template
    where: Group
    order_by: list[tuple[str, bool]]  # (var, ascending)
    limit: int | None
    aggs: list[Agg] = field(default_factory=list)
    group_by: list[str] = field(default_factory=list)
    offset: int | None = None
    having: list = field(default_factory=list)   # [token list]


class _Parser:
    def __init__(self, toks: list[str]):
        self.toks = toks
        self.i = 0
        self.prefixes: dict[str, str] = {}

    def peek(self, ahead: int = 0) -> str | None:
        j = self.i + ahead
        return self.toks[j] if j < len(self.toks) else None

    def next(self) -> str:
        t = self.peek()
        if t is None:
            raise ValueError("sparql: unexpected end of query")
        self.i += 1
        return t

    def expect(self, tok: str) -> None:
        t = self.next()
        if t.upper() != tok.upper():
            raise ValueError(f"sparql: expected {tok!r}, got {t!r}")

    def _expand_pname(self, t: str) -> str:
        pfx, local = t.split(":", 1)
        if pfx not in self.prefixes:
            raise ValueError(f"sparql: unknown prefix {pfx!r}")
        return self.prefixes[pfx] + local

    def term(self) -> Term:
        t = self.next()
        if t.startswith("?"):
            if t[1:].startswith("__"):
                raise ValueError(
                    "sparql: variable names starting with __ are reserved")
            return Term("var", t[1:])
        if t.startswith("<"):
            return Term("iri", t[1:-1])
        if t.startswith('"'):
            return Term("lit", t[1:-1].replace('\\"', '"'))
        if t == "a":
            return Term("iri", RDF_TYPE)
        if ":" in t:
            return Term("iri", self._expand_pname(t))
        if re.fullmatch(r"-?\d+(\.\d+)?", t):
            return Term("lit", t)
        raise ValueError(f"sparql: bad term {t!r}")

    def parse(self) -> Query:
        while self.peek() and self.peek().upper() == "PREFIX":
            self.next()
            pname = self.next()           # e.g. dcterms:
            iri = self.next()             # <...>
            self.prefixes[pname.rstrip(":")] = iri[1:-1]
        form = self.next().upper()
        if form == "DESCRIBE":
            # DESCRIBE <uri>... / DESCRIBE ?v WHERE { ... }; variable
            # targets are stored "?"-prefixed in select_vars
            targets = []
            has_var = False
            while self.peek() and self.peek().upper() != "WHERE":
                t = self.term()
                if t.kind == "var":
                    targets.append("?" + t.value)
                    has_var = True
                elif t.kind == "iri":
                    targets.append(t.value)
                else:
                    raise ValueError(
                        "sparql: DESCRIBE takes IRIs or variables")
            where = Group()
            if self.peek() and self.peek().upper() == "WHERE":
                self.next()
                self.expect("{")
                where = self.group()
                self.expect("}")
            elif has_var:
                raise ValueError(
                    "sparql: DESCRIBE with variables needs a WHERE group")
            return Query("describe", targets, False, [], where, [], None)
        if form not in ("SELECT", "CONSTRUCT", "ASK"):
            raise ValueError(f"sparql: unsupported form {form}")
        select_vars: list[str] = []
        aggs: list[Agg] = []
        distinct = False
        template: list[Pattern] = []
        if form == "SELECT":
            select_vars, aggs, distinct = self._select_head()
            self.expect("WHERE")
        elif form == "CONSTRUCT":
            if self.peek() and self.peek().upper() == "WHERE":
                # CONSTRUCT WHERE { ... } shorthand: the (plain
                # triple-pattern) group is both template and WHERE
                self.next()
                self.expect("{")
                where = self.group()
                self.expect("}")
                if (where.unions or where.optionals or where.filters
                        or where.binds or where.exists or where.minuses
                        or where.values or where.subselects
                        or any(p.path or p.p.kind == "path"
                               for p in where.patterns)):
                    raise ValueError(
                        "sparql: CONSTRUCT WHERE shorthand allows only "
                        "plain triple patterns")
                (order_by, group_by, limit,
                 offset, having) = self._modifiers()
                return Query("construct", [], False,
                             list(where.patterns), where, order_by,
                             limit, [], group_by, offset, having)
            self.expect("{")
            template = self.pattern_list()
            self.expect("}")
            self.expect("WHERE")
        elif form == "ASK":            # WHERE keyword optional
            if self.peek() and self.peek().upper() == "WHERE":
                self.next()
        self.expect("{")
        where = self.group()
        self.expect("}")
        order_by, group_by, limit, offset, having = self._modifiers()
        return Query(form.lower(), select_vars, distinct, template,
                     where, order_by, limit, aggs, group_by, offset,
                     having)

    def _select_head(self) -> tuple[list[str], list[Agg], bool]:
        select_vars: list[str] = []
        aggs: list[Agg] = []
        distinct = False
        if self.peek() and self.peek().upper() == "DISTINCT":
            self.next()
            distinct = True
        while self.peek() and (self.peek().startswith("?")
                               or self.peek() in ("*", "(")):
            t = self.next()
            if t == "(":          # (FUNC([DISTINCT] ?v|*) AS ?alias)
                aggs.append(self._agg())
            elif t != "*":
                select_vars.append(t[1:])
        return select_vars, aggs, distinct

    def _modifiers(self, stop: str | None = None):
        order_by: list[tuple[str, bool]] = []
        group_by: list[str] = []
        limit = None
        offset = None
        having: list = []
        while self.peek() and (stop is None or self.peek() != stop):
            t = self.next().upper()
            if t == "GROUP":
                self.expect("BY")
                while self.peek() and self.peek().startswith("?"):
                    group_by.append(self.next()[1:])
            elif t == "ORDER":
                self.expect("BY")
                while self.peek() and (self.peek().startswith("?")
                                       or self.peek().upper() in ("ASC",
                                                                  "DESC")):
                    asc = True
                    if self.peek().upper() in ("ASC", "DESC"):
                        asc = self.next().upper() == "ASC"
                        self.expect("(")
                        v = self.next()
                        self.expect(")")
                    else:
                        v = self.next()
                    order_by.append((v[1:], asc))
            elif t == "LIMIT":
                limit = int(self.next())
            elif t == "OFFSET":
                offset = int(self.next())
            elif t == "HAVING":
                having.append(self._filter_tokens())
            else:
                raise ValueError(f"sparql: unexpected trailing {t!r}")
        return order_by, group_by, limit, offset, having

    def _subselect(self) -> Query:
        """``{ SELECT ... WHERE { ... } GROUP BY ... }`` inside a
        group — the SELECT token is already consumed."""
        select_vars, aggs, distinct = self._select_head()
        if self.peek() and self.peek().upper() == "WHERE":
            self.next()
        self.expect("{")
        where = self.group()
        self.expect("}")
        order_by, group_by, limit, offset, having = self._modifiers("}")
        return Query("select", select_vars, distinct, [], where,
                     order_by, limit, aggs, group_by, offset, having)

    def _agg(self) -> Agg:
        func = self.next().lower()
        if func not in ("count", "sum", "min", "max", "avg", "sample",
                        "group_concat"):
            raise ValueError(f"sparql: unsupported aggregate {func!r}")
        self.expect("(")
        adist = False
        if self.peek() and self.peek().upper() == "DISTINCT":
            self.next()
            adist = True
        v = self.next()
        var = None if v == "*" else v[1:]
        sep = " "
        if func == "group_concat" and self.peek() == ";":
            self.next()
            kw = self.next()
            if kw.upper() != "SEPARATOR":
                raise ValueError(
                    f"sparql: expected SEPARATOR, got {kw!r}")
            self.expect("=")
            lit = self.next()
            if not lit.startswith('"'):
                raise ValueError("sparql: SEPARATOR needs a literal")
            sep = lit[1:-1].replace('\\"', '"')
        self.expect(")")
        as_kw = self.next()
        if as_kw.upper() != "AS":
            raise ValueError(f"sparql: expected AS, got {as_kw!r}")
        alias = self.next()
        if not alias.startswith("?"):
            raise ValueError("sparql: aggregate alias must be a ?var")
        self.expect(")")
        return Agg(func, var, alias[1:], adist, sep)

    def pattern_list(self) -> list[Pattern]:
        pats: list[Pattern] = []
        while self.peek() and self.peek() != "}":
            pats.extend(self.pattern_block())
            if self.peek() == ".":
                self.next()
        return pats

    def _path_quant(self) -> tuple[int, int | None] | None:
        t = self.peek()
        if t == "*":
            self.next()
            return (0, None)
        if t == "+":
            self.next()
            return (1, None)
        if t == "?":
            self.next()
            return (0, 1)
        if t == "{":
            # {m,n} / {,n} / {m,} — SPARQL 1.1 draft quantifiers the
            # reference uses (prop-annotations.rq 'isPartOf{,1}')
            self.next()
            lo = 0
            if self.peek() and re.fullmatch(r"\d+", self.peek()):
                lo = int(self.next())
            self.expect(",")
            hi = None
            if self.peek() and re.fullmatch(r"\d+", self.peek()):
                hi = int(self.next())
            self.expect("}")
            return (lo, hi)
        return None

    def _path_elt(self) -> PathElt:
        inv = False
        if self.peek() == "^":
            self.next()
            inv = True
        if self.peek() == "!":
            # negated property set: !iri or !(iri|iri|...), forward
            # members only (inverse members unsupported)
            self.next()
            if inv:
                raise ValueError(
                    "sparql: ^! path combination is not supported")
            iris = []
            if self.peek() == "(":
                self.next()
                while True:
                    t = self.term()
                    if t.kind != "iri":
                        raise ValueError(
                            "sparql: negated property sets take IRIs")
                    iris.append(t.value)
                    if self.peek() == "|":
                        self.next()
                        continue
                    break
                self.expect(")")
            else:
                t = self.term()
                if t.kind != "iri":
                    raise ValueError(
                        "sparql: negated property sets take IRIs")
                iris.append(t.value)
            return PathElt(None, False, self._path_quant(), None, iris)
        if self.peek() == "(":
            self.next()
            alt = self._path_alt()
            self.expect(")")
            return PathElt(None, inv, self._path_quant(), alt)
        t = self.term()
        if t.kind != "iri":
            raise ValueError(
                "sparql: property path elements must be IRIs")
        return PathElt(t.value, inv, self._path_quant())

    def _path_seq(self, first: PathElt | None = None) -> PathSeq:
        elts = [first if first is not None else self._path_elt()]
        while self.peek() == "/":
            self.next()
            elts.append(self._path_elt())
        return PathSeq(elts)

    def _path_alt(self, first: PathElt | None = None) -> PathAlt:
        seqs = [self._path_seq(first)]
        while self.peek() == "|":
            self.next()
            seqs.append(self._path_seq())
        return PathAlt(seqs)

    def _pred(self) -> tuple[Term, tuple | None]:
        """The predicate position: a var, a bare (possibly quantified)
        IRI — the fast scan path — or a full path expression."""
        if self.peek() in ("^", "(", "!"):
            return Term("path", self._path_alt()), None
        p = self.term()
        quant = self._path_quant()
        if self.peek() in ("/", "|"):
            if p.kind != "iri":
                raise ValueError(
                    "sparql: property path elements must be IRIs")
            first = PathElt(p.value, False, quant)
            return Term("path", self._path_alt(first)), None
        return p, quant

    def pattern_block(self) -> list[Pattern]:
        """One subject's statements: ``s p1 o1a, o1b ; p2 o2`` ->
        patterns sharing the subject (``;`` predicate-object lists and
        ``,`` object lists)."""
        s = self.term()
        pats: list[Pattern] = []
        while True:
            p, path = self._pred()
            pats.append(Pattern(s, p, self.term(), path))
            while self.peek() == ",":
                self.next()
                pats.append(Pattern(s, p, self.term(), path))
            if self.peek() == ";":
                self.next()
                if self.peek() in (None, ".", "}", ";"):   # trailing ;
                    break
                continue
            break
        return pats

    def group(self) -> Group:
        g = Group()
        while True:
            t = self.peek()
            if t is None or t == "}":
                return g
            up = t.upper()
            if up == "OPTIONAL":
                self.next()
                self.expect("{")
                g.optionals.append(self.group())
                self.expect("}")
            elif up == "FILTER":
                self.next()
                nt = self.peek()
                if nt and nt.upper() == "EXISTS":
                    self.next()
                    self.expect("{")
                    g.exists.append((True, self.group()))
                    self.expect("}")
                elif nt and nt.upper() == "NOT" \
                        and (self.peek(1) or "").upper() == "EXISTS":
                    self.next()
                    self.next()
                    self.expect("{")
                    g.exists.append((False, self.group()))
                    self.expect("}")
                else:
                    g.filters.append(self._filter_tokens())
            elif up == "MINUS":
                self.next()
                self.expect("{")
                g.minuses.append(self.group())
                self.expect("}")
            elif up == "VALUES":
                self.next()
                g.values.append(self._values())
            elif up == "BIND":
                self.next()
                toks = self._filter_tokens()
                # split on the top-level AS
                depth, split = 0, None
                for j, bt in enumerate(toks):
                    if bt == "(":
                        depth += 1
                    elif bt == ")":
                        depth -= 1
                    elif depth == 0 and bt.upper() == "AS":
                        split = j
                if split is None or split + 1 >= len(toks) \
                        or not toks[split + 1].startswith("?"):
                    raise ValueError("sparql: BIND needs (expr AS ?var)")
                g.binds.append((toks[:split], toks[split + 1][1:]))
            elif up == "GRAPH":
                # single-graph store: the DataFrame handed to
                # sparql_query IS the named dataset, so the GRAPH
                # wrapper is transparent (constant graph names only)
                self.next()
                gterm = self.term()
                if gterm.kind == "var":
                    raise ValueError(
                        "sparql: GRAPH with a variable graph name is "
                        "not supported (single-graph store)")
                self.expect("{")
                self._merge(g, self.group())
                self.expect("}")
            elif t == "{":
                self.next()
                if self.peek() and self.peek().upper() == "SELECT":
                    self.next()
                    g.subselects.append(self._subselect())
                    self.expect("}")
                    continue
                first = self.group()
                self.expect("}")
                branches = [first]
                while self.peek() and self.peek().upper() == "UNION":
                    self.next()
                    self.expect("{")
                    branches.append(self.group())
                    self.expect("}")
                if len(branches) == 1:   # plain nested group: merge
                    self._merge(g, first)
                else:
                    g.unions.append(branches)
            elif t == ".":
                self.next()
            else:
                g.patterns.extend(self.pattern_block())
        return g

    def _values(self) -> tuple[list[str], list[tuple]]:
        """``VALUES ?x { v... }`` or ``VALUES (?x ?y) { (vx vy)... }``."""
        def cell() -> str:
            t = self.term()
            if t.kind == "var":
                raise ValueError("sparql: VALUES data must be constants")
            return t.value
        if self.peek() == "(":
            self.next()
            names = []
            while self.peek() != ")":
                v = self.next()
                if not v.startswith("?"):
                    if v.upper() == "UNDEF":
                        raise ValueError("sparql: VALUES UNDEF unsupported")
                    raise ValueError(f"sparql: VALUES expects ?vars, got {v!r}")
                names.append(v[1:])
            self.next()
            self.expect("{")
            rows = []
            while self.peek() == "(":
                self.next()
                row = []
                while self.peek() != ")":
                    if (self.peek() or "").upper() == "UNDEF":
                        raise ValueError("sparql: VALUES UNDEF unsupported")
                    row.append(cell())
                self.next()
                if len(row) != len(names):
                    raise ValueError("sparql: VALUES row arity mismatch")
                rows.append(tuple(row))
            self.expect("}")
            return names, rows
        v = self.next()
        if not v.startswith("?"):
            raise ValueError(f"sparql: VALUES expects a ?var, got {v!r}")
        self.expect("{")
        rows = []
        while self.peek() != "}":
            if (self.peek() or "").upper() == "UNDEF":
                raise ValueError("sparql: VALUES UNDEF unsupported")
            rows.append((cell(),))
        self.next()
        return [v[1:]], rows

    @staticmethod
    def _merge(g: Group, sub: Group) -> None:
        g.patterns.extend(sub.patterns)
        g.optionals.extend(sub.optionals)
        g.unions.extend(sub.unions)
        g.filters.extend(sub.filters)
        g.binds.extend(sub.binds)
        g.exists.extend(sub.exists)
        g.minuses.extend(sub.minuses)
        g.values.extend(sub.values)
        g.subselects.extend(sub.subselects)

    def _filter_tokens(self) -> list[str]:
        """Collect the parenthesized token list of a FILTER/BIND,
        expanding pnames to ``<iri>`` tokens so downstream compilation
        needs no prefix table."""
        self.expect("(")
        depth, toks = 1, []
        while depth:
            t = self.next()
            if t == "(":
                depth += 1
            elif t == ")":
                depth -= 1
                if not depth:
                    break
            if (":" in t and not t.startswith(("?", '"', "<"))
                    and not re.fullmatch(r"-?\d+(\.\d+)?", t)):
                t = "<" + self._expand_pname(t) + ">"
            toks.append(t)
        return toks


def parse_sparql(q: str) -> Query:
    return _Parser(_tokenize(q)).parse()


# ---------------------------------------------------------------------------
# FILTER / BIND expression compilation (token list -> Spark SQL string)

_FUNCS_2 = {"strstarts": "startswith", "strends": "endswith",
            "contains": "contains"}
_FUNCS_1 = {"lcase": "lower", "ucase": "upper", "strlen": "length"}
_CMP_OPS = ("=", "!=", "<", "<=", ">", ">=")
_XSD = "http://www.w3.org/2001/XMLSchema#"
_XSD_CASTS = {"integer": "BIGINT", "int": "BIGINT", "long": "BIGINT",
              "short": "BIGINT", "byte": "BIGINT",
              "nonNegativeInteger": "BIGINT",
              "decimal": "DOUBLE", "double": "DOUBLE", "float": "DOUBLE",
              "string": "STRING", "boolean": "BOOLEAN",
              "date": "DATE", "dateTime": "TIMESTAMP"}


class _ExprCompiler:
    """Recursive-descent compiler for the FILTER/BIND expression subset
    to an injection-safe Spark SQL string: every emitted fragment is a
    backticked column, a vetted operator/function, or a literal
    re-quoted from our own tokenizer."""

    def __init__(self, toks: list[str], cols: set[str]):
        self.toks = toks
        self.cols = cols
        self.i = 0

    def peek(self, ahead: int = 0) -> str | None:
        j = self.i + ahead
        return self.toks[j] if j < len(self.toks) else None

    def next(self) -> str:
        t = self.peek()
        if t is None:
            raise ValueError("sparql: unexpected end of FILTER expression")
        self.i += 1
        return t

    def expect(self, tok: str) -> None:
        t = self.next()
        if t != tok:
            raise ValueError(f"sparql: FILTER expected {tok!r}, got {t!r}")

    def compile(self) -> str:
        out = self.or_expr()
        if self.peek() is not None:
            raise ValueError(
                f"sparql: trailing FILTER token {self.peek()!r}")
        return out

    def or_expr(self) -> str:
        parts = [self.and_expr()]
        while self.peek() == "||":
            self.next()
            parts.append(self.and_expr())
        return " OR ".join(parts) if len(parts) > 1 \
            else parts[0]

    def and_expr(self) -> str:
        parts = [self.not_expr()]
        while self.peek() == "&&":
            self.next()
            parts.append(self.not_expr())
        return " AND ".join(f"({p})" for p in parts) if len(parts) > 1 \
            else parts[0]

    def not_expr(self) -> str:
        if self.peek() == "!":
            self.next()
            return f"(NOT ({self.not_expr()}))"
        return self.rel_expr()

    def rel_expr(self) -> str:
        left = self.add_expr()
        t = self.peek()
        if t in _CMP_OPS:
            self.next()
            return f"{left} {t} {self.add_expr()}"
        if t is not None and t.upper() == "IN":
            self.next()
            self.expect("(")
            items = [self.add_expr()]
            while self.peek() == ",":
                self.next()
                items.append(self.add_expr())
            self.expect(")")
            return f"{left} IN ({', '.join(items)})"
        return left

    def add_expr(self) -> str:
        out = self.mul_expr()
        while True:
            t = self.peek()
            if t in ("+", "-"):
                self.next()
                out = f"({out} {t} {self.mul_expr()})"
            elif t is not None and re.fullmatch(r"-\d+(\.\d+)?", t):
                # '10 -3' tokenizes the 3 as a negative number
                self.next()
                out = f"({out} - {t[1:]})"
            else:
                return out

    def mul_expr(self) -> str:
        out = self.value()
        while self.peek() in ("*", "/"):
            op = self.next()
            out = f"({out} {op} {self.value()})"
        return out

    def _var_col(self, t: str) -> str:
        v = t[1:]
        if v not in self.cols:
            raise ValueError(f"sparql: FILTER on unbound ?{v}")
        return f"`{v}`"

    def _shadow(self, t: str, prefix: str = _SHADOW) -> str:
        v = t[1:]
        if v not in self.cols:
            raise ValueError(f"sparql: FILTER on unbound ?{v}")
        sh = prefix + v
        if sh not in self.cols:
            what = ("obj_is_uri (isURI/isLiteral)" if prefix == _SHADOW
                    else "obj_lang (lang/langMatches)")
            raise ValueError(
                f"sparql: {what} needs its column in the triples "
                f"DataFrame (missing for ?{v})")
        return f"`{sh}`"

    def value(self) -> str:
        t = self.next()
        low = t.lower()
        if t == "(":
            inner = self.or_expr()
            self.expect(")")
            return f"({inner})"
        if t.startswith("?"):
            return self._var_col(t)
        if t.startswith('"'):
            return "'" + t[1:-1].replace("\\\\", "\\").replace('\\"', '"') \
                .replace("'", "''") + "'"
        if t.startswith("<"):
            iri = t[1:-1]
            # xsd constructor casts: try_cast, so a SPARQL type error
            # yields NULL (filter-false) instead of an ANSI runtime
            # abort on dirty data
            if iri.startswith(_XSD) and self.peek() == "(":
                sql_type = _XSD_CASTS.get(iri[len(_XSD):])
                if sql_type is None:
                    raise ValueError(
                        f"sparql: unsupported xsd cast {iri!r}")
                arg, = self._args(1, 1)
                return f"try_cast({arg} AS {sql_type})"
            # otherwise IRIs are plain string terms
            return "'" + iri.replace("'", "''") + "'"
        if re.fullmatch(r"-?\d+(\.\d+)?", t):
            return t
        if low == "regex":
            self.expect("(")
            arg = self.value()
            self.expect(",")
            pat = self.value()
            self.expect(")")
            return f"({arg} RLIKE {pat})"
        if low == "bound":
            self.expect("(")
            v = self._var_col(self.next())
            self.expect(")")
            return f"({v} IS NOT NULL)"
        if low == "str":
            self.expect("(")
            arg = self.value()
            self.expect(")")
            return f"CAST({arg} AS STRING)"
        if low in ("iri", "uri"):
            # terms are stored as plain strings; IRI() is the identity
            arg, = self._args(1, 1)
            return f"CAST({arg} AS STRING)"
        if low == "sameterm":
            a, b = self._args(2, 2)
            return f"({a} <=> {b})"
        if low == "isblank":
            # the engine's triple tables carry no blank nodes (the
            # reference skolemizes on distill)
            self._args(1, 1)
            return "false"
        if low in ("isuri", "isiri"):
            self.expect("(")
            sh = self._shadow(self.next())
            self.expect(")")
            return f"(coalesce({sh}, false))"
        if low == "isliteral":
            self.expect("(")
            vt = self.next()
            v, sh = self._var_col(vt), self._shadow(vt)
            self.expect(")")
            return f"({v} IS NOT NULL AND NOT coalesce({sh}, false))"
        if low == "lang":
            # SPARQL lang() returns "" for plain literals and IRIs
            self.expect("(")
            sh = self._shadow(self.next(), _LANG_SHADOW)
            self.expect(")")
            return f"coalesce({sh}, '')"
        if low == "langmatches":
            # RFC 4647 basic filtering: '*' = any non-empty tag,
            # otherwise exact primary tag or 'tag-' prefix
            self.expect("(")
            rng = self.or_expr()
            self.expect(",")
            tag = self.next()
            if not tag.startswith('"'):
                raise ValueError(
                    "sparql: langMatches needs a literal range")
            self.expect(")")
            t = tag[1:-1].replace("'", "''").lower()
            if t == "*":
                return f"({rng} <> '')"
            return (f"(lower({rng}) = '{t}' OR "
                    f"startswith(lower({rng}), '{t}-'))")
        if low in _FUNCS_2:
            self.expect("(")
            a = self.value()
            self.expect(",")
            b = self.value()
            self.expect(")")
            return f"{_FUNCS_2[low]}({a}, {b})"
        if low in _FUNCS_1:
            self.expect("(")
            a = self.value()
            self.expect(")")
            return f"{_FUNCS_1[low]}({a})"
        if low in ("concat", "coalesce"):
            args = self._args(1, None)
            return f"{low}({', '.join(args)})"
        if low == "if":
            c, a, b = self._args(3, 3)
            return f"if({c}, {a}, {b})"
        if low == "substr":
            # SPARQL SUBSTR is 1-based like SQL substring
            args = self._args(2, 3)
            return f"substring({', '.join(args)})"
        if low == "replace":
            # SPARQL REPLACE is regex-based
            a, pat, rep = self._args(3, 3)
            return f"regexp_replace({a}, {pat}, {rep})"
        if low in ("strbefore", "strafter"):
            a, b = self._args(2, 2)
            if low == "strbefore":
                # '' when the needle does not occur, per spec
                return (f"(CASE WHEN instr({a}, {b}) > 0 THEN "
                        f"substring({a}, 1, instr({a}, {b}) - 1) "
                        f"ELSE '' END)")
            return (f"(CASE WHEN instr({a}, {b}) > 0 THEN "
                    f"substring({a}, instr({a}, {b}) + length({b})) "
                    f"ELSE '' END)")
        raise ValueError(f"sparql: unsupported FILTER token {t!r}")

    def _args(self, lo: int, hi: int | None) -> list[str]:
        self.expect("(")
        args = [self.or_expr()]
        while self.peek() == ",":
            self.next()
            args.append(self.or_expr())
        self.expect(")")
        if len(args) < lo or (hi is not None and len(args) > hi):
            raise ValueError(
                f"sparql: wrong argument count ({len(args)})")
        return args


def _filter_expr(toks: list[str], cols: set[str]) -> Column:
    return F.expr(_ExprCompiler(toks, cols).compile())


def _uses_shadows(g: Group) -> frozenset:
    """Which shadow-column kinds ('isuri', 'lang') do the FILTER/BIND
    expressions in this group tree need?"""
    kinds = set()
    for toks in g.filters + [b[0] for b in g.binds]:
        for t in toks:
            low = t.lower()
            if low in ("isuri", "isiri", "isliteral"):
                kinds.add("isuri")
            elif low in ("lang", "langmatches"):
                kinds.add("lang")
    for sub in (g.optionals + g.minuses + [e[1] for e in g.exists]
                + [b for bs in g.unions for b in bs]
                + [q.where for q in g.subselects]):
        kinds |= _uses_shadows(sub)
    return frozenset(kinds)


# ---------------------------------------------------------------------------
# compilation

def _pattern_df(triples: DataFrame, pat: Pattern, max_path_depth: int,
                kinds: frozenset) -> tuple[DataFrame, int]:
    """One triple pattern -> (projected scan keyed by its variable
    columns, n_bound_constants).  Constants become pushdown filters.
    Each requested shadow kind adds a per-var column: ``__isuri__v``
    (True for subj/pred bindings — always IRIs in RDF — else the
    table's obj_is_uri flag) and ``__lang__v`` (obj_lang for obj
    bindings, NULL otherwise)."""
    if pat.p.kind == "path":
        return _complex_path_df(triples, pat, max_path_depth, kinds)
    if pat.path:
        return _path_df(triples, pat, max_path_depth, kinds)
    df = triples
    n_bound = 0
    sel: dict[str, str] = {}  # var -> source column
    for term, col in ((pat.s, "subj"), (pat.p, "pred"), (pat.o, "obj")):
        if term.kind == "var":
            if term.value in sel:   # e.g. ?x ?p ?x — self-reference
                df = df.where(F.col(col) == F.col(sel[term.value]))
            else:
                sel[term.value] = col
        else:
            df = df.where(F.col(col) == term.value)
            n_bound += 1
    cols = [F.col(c).alias(v) for v, c in sel.items()]
    for v, c in sel.items():
        if "isuri" in kinds:
            cols.append((F.col("obj_is_uri") if c == "obj"
                         else F.lit(True)).alias(_SHADOW + v))
        if "lang" in kinds:
            cols.append((F.col("obj_lang") if c == "obj"
                         else F.lit(None).cast("string"))
                        .alias(_LANG_SHADOW + v))
    return df.select(*cols), n_bound


def _path_df(triples: DataFrame, pat: Pattern, max_path_depth: int,
             kinds: frozenset) -> tuple[DataFrame, int]:
    """``?s p* ?o`` / ``p+`` / ``p{m,n}``: bounded closure of the
    p-edge subset.  Zero-length paths (min 0) mean every node reaches
    itself — for a constant endpoint that is just the constant row;
    for the var-var form the node set of the p-subgraph."""
    if pat.p.kind == "var":
        raise ValueError("sparql: property path needs a constant predicate")
    lo, hi = pat.path
    hi = max_path_depth if hi is None else hi
    edges = (triples.where(F.col("pred") == pat.p.value)
             .select(F.col("subj").alias("_s"), F.col("obj").alias("_o"))
             .dropDuplicates())
    closure = edges if lo <= 1 and hi >= 1 else None
    frontier = edges
    for length in range(2, hi + 1):
        frontier = (frontier.alias("f")
                    .join(edges.alias("e"),
                          F.col("f._o") == F.col("e._s"))
                    .select(F.col("f._s").alias("_s"),
                            F.col("e._o").alias("_o")))
        if length >= lo:
            closure = frontier if closure is None \
                else closure.unionByName(frontier).dropDuplicates()
    if lo == 0:
        if pat.s.kind != "var":
            zero = triples.sparkSession.createDataFrame(
                [(pat.s.value, pat.s.value)], "_s string, _o string")
        elif pat.o.kind != "var":
            zero = triples.sparkSession.createDataFrame(
                [(pat.o.value, pat.o.value)], "_s string, _o string")
        else:
            nodes = (edges.select(F.col("_s").alias("n"))
                     .unionByName(edges.select(F.col("_o").alias("n")))
                     .dropDuplicates())
            zero = nodes.select(F.col("n").alias("_s"),
                                F.col("n").alias("_o"))
        closure = zero if closure is None \
            else closure.unionByName(zero).dropDuplicates()
    if closure is None:
        raise ValueError(f"sparql: empty path quantifier {{{lo},{hi}}}")

    df = closure
    n_bound = 0
    sel: dict[str, str] = {}
    for term, col in ((pat.s, "_s"), (pat.o, "_o")):
        if term.kind == "var":
            if term.value in sel:
                df = df.where(F.col(col) == F.col(sel[term.value]))
            else:
                sel[term.value] = col
        else:
            df = df.where(F.col(col) == term.value)
            n_bound += 1
    cols = [F.col(c).alias(v) for v, c in sel.items()]
    # path endpoints are IRIs by construction (part-tree edges)
    if "isuri" in kinds:
        cols += [F.lit(True).alias(_SHADOW + v) for v in sel]
    if "lang" in kinds:
        cols += [F.lit(None).cast("string").alias(_LANG_SHADOW + v)
                 for v in sel]
    return df.select(*cols), n_bound


def _edge_nodes(edges: DataFrame) -> DataFrame:
    return (edges.select(F.col("_s").alias("n"))
            .unionByName(edges.select(F.col("_o").alias("n")))
            .dropDuplicates())


def _edge_closure(edges: DataFrame, lo: int, hi: int) -> DataFrame:
    """Paths of length max(lo,1)..hi over an (_s,_o) edge set; a
    zero-length component (lo == 0) is the identity over the edge
    subgraph's node set."""
    closure = edges if lo <= 1 and hi >= 1 else None
    frontier = edges
    for length in range(2, hi + 1):
        frontier = (frontier.alias("f")
                    .join(edges.alias("e"),
                          F.col("f._o") == F.col("e._s"))
                    .select(F.col("f._s").alias("_s"),
                            F.col("e._o").alias("_o")))
        if length >= lo:
            closure = frontier if closure is None \
                else closure.unionByName(frontier).dropDuplicates()
    if lo == 0:
        zero = _edge_nodes(edges).select(F.col("n").alias("_s"),
                                         F.col("n").alias("_o"))
        closure = zero if closure is None \
            else closure.unionByName(zero).dropDuplicates()
    if closure is None:
        raise ValueError(f"sparql: empty path quantifier {{{lo},{hi}}}")
    return closure


def _elt_edges(triples: DataFrame, elt: PathElt,
               max_path_depth: int) -> DataFrame:
    if elt.neg is not None:
        base = (triples.where(~F.col("pred").isin(elt.neg))
                .select(F.col("subj").alias("_s"),
                        F.col("obj").alias("_o"))
                .dropDuplicates())
    elif elt.group is not None:
        base = _alt_edges(triples, elt.group, max_path_depth)
    else:
        base = (triples.where(F.col("pred") == elt.iri)
                .select(F.col("subj").alias("_s"),
                        F.col("obj").alias("_o"))
                .dropDuplicates())
    if elt.inverse:
        base = base.select(F.col("_o").alias("_s"),
                           F.col("_s").alias("_o"))
    if elt.quant is not None:
        lo, hi = elt.quant
        base = _edge_closure(base, lo,
                             max_path_depth if hi is None else hi)
    return base


def _alt_edges(triples: DataFrame, alt: PathAlt,
               max_path_depth: int) -> DataFrame:
    """A path expression -> its (_s, _o) edge DataFrame: sequences are
    chained joins (_o -> _s), alternatives union.  An alternation of
    plain forward predicates collapses to ONE isin-filtered scan
    instead of per-branch scans + union."""
    plain = [s.elts[0].iri for s in alt.seqs
             if len(s.elts) == 1 and s.elts[0].iri is not None
             and not s.elts[0].inverse and s.elts[0].quant is None]
    if len(alt.seqs) > 1 and len(plain) == len(alt.seqs):
        return (triples.where(F.col("pred").isin(plain))
                .select(F.col("subj").alias("_s"),
                        F.col("obj").alias("_o"))
                .dropDuplicates())
    seq_dfs = []
    for seq in alt.seqs:
        df = None
        for elt in seq.elts:
            e = _elt_edges(triples, elt, max_path_depth)
            df = e if df is None else (
                df.alias("l")
                .join(e.alias("r"), F.col("l._o") == F.col("r._s"))
                .select(F.col("l._s").alias("_s"),
                        F.col("r._o").alias("_o")))
        seq_dfs.append(df)
    out = seq_dfs[0]
    for d in seq_dfs[1:]:
        out = out.unionByName(d)
    return out.dropDuplicates()


def _complex_path_df(triples: DataFrame, pat: Pattern,
                     max_path_depth: int, kinds: frozenset,
                     ) -> tuple[DataFrame, int]:
    """A pattern whose predicate is a path EXPRESSION (sequence /
    inverse / alternation): compile the expression to an edge set,
    then bind the endpoints like the simple-path case."""
    df = _alt_edges(triples, pat.p.value, max_path_depth)
    n_bound = 0
    sel: dict[str, str] = {}
    for term, col in ((pat.s, "_s"), (pat.o, "_o")):
        if term.kind == "var":
            if term.value in sel:
                df = df.where(F.col(col) == F.col(sel[term.value]))
            else:
                sel[term.value] = col
        else:
            df = df.where(F.col(col) == term.value)
            n_bound += 1
    cols = [F.col(c).alias(v) for v, c in sel.items()]
    if "isuri" in kinds:
        cols += [F.lit(True).alias(_SHADOW + v) for v in sel]
    if "lang" in kinds:
        cols += [F.lit(None).cast("string").alias(_LANG_SHADOW + v)
                 for v in sel]
    return df.select(*cols), n_bound


def _var_cols(cols) -> list[str]:
    return [c for c in cols if not _is_shadow(c)]


def _drop_dup_shadows(df: DataFrame, sol_cols: set[str]) -> DataFrame:
    dups = [c for c in df.columns if _is_shadow(c) and c in sol_cols]
    return df.drop(*dups) if dups else df


def _join_patterns(triples: DataFrame, pats: list[Pattern],
                   max_path_depth: int, kinds: frozenset,
                   ) -> DataFrame | None:
    if not pats:
        return None
    scans = [_pattern_df(triples, p, max_path_depth, kinds) for p in pats]
    # selectivity-ordered greedy join: start from the most
    # constant-bound scan, always extend with a scan sharing a variable
    order = sorted(range(len(scans)), key=lambda i: -scans[i][1])
    used = [False] * len(scans)
    first = order[0]
    used[first] = True
    sol = scans[first][0]
    remaining = len(scans) - 1
    while remaining:
        pick = None
        for i in order:
            if used[i]:
                continue
            if set(_var_cols(scans[i][0].columns)) & set(sol.columns):
                pick = i
                break
        if pick is None:          # disconnected query: cartesian
            pick = next(i for i in order if not used[i])
            sol = sol.crossJoin(_drop_dup_shadows(scans[pick][0],
                                                  set(sol.columns)))
        else:
            df, n_bound = scans[pick]
            shared = [c for c in _var_cols(df.columns) if c in sol.columns]
            df = _drop_dup_shadows(df, set(sol.columns))
            # a 2+-constant pattern is a needle => broadcast it
            sol = sol.join(F.broadcast(df) if n_bound >= 2 else df,
                           on=shared)
        used[pick] = True
        remaining -= 1
    return sol


def _null_pad(df: DataFrame, cols: list[str]) -> DataFrame:
    for c in cols:
        if c not in df.columns:
            typ = "boolean" if c.startswith(_SHADOW) else "string"
            df = df.withColumn(c, F.lit(None).cast(typ))
    return df.select(*cols)


def _apply_bind(sol: DataFrame, toks: list[str], var: str,
                kinds: frozenset) -> DataFrame:
    if var in sol.columns:
        raise ValueError(f"sparql: BIND would rebind ?{var}")
    if len(toks) == 1 and toks[0].startswith("?"):   # alias a variable
        src = toks[0][1:]
        if src not in sol.columns:
            raise ValueError(f"sparql: BIND of unbound ?{src}")
        sol = sol.withColumn(var, F.col(src))
        for kind, prefix, typ in (("isuri", _SHADOW, "boolean"),
                                  ("lang", _LANG_SHADOW, "string")):
            if kind in kinds:
                sh = prefix + src
                sol = sol.withColumn(
                    prefix + var,
                    F.col(sh) if sh in sol.columns
                    else F.lit(None).cast(typ))
        return sol
    expr = _ExprCompiler(toks, set(sol.columns)).compile()
    sol = sol.withColumn(var, F.expr(expr))
    if "isuri" in kinds:
        # a computed value is a literal unless it is a single IRI
        # token or an IRI()/URI() constructor call
        is_iri = (len(toks) == 1 and toks[0].startswith("<")) \
            or toks[0].lower() in ("iri", "uri")
        sol = sol.withColumn(_SHADOW + var, F.lit(bool(is_iri)))
    if "lang" in kinds:   # computed values carry no language tag
        sol = sol.withColumn(_LANG_SHADOW + var,
                             F.lit(None).cast("string"))
    return sol


def _values_df(spark, names: list[str], rows: list[tuple]) -> DataFrame:
    schema = ", ".join(f"`{n}` string" for n in names)
    return spark.createDataFrame(rows, schema)


def _select_result(sol: DataFrame, ast: Query) -> DataFrame:
    """Solution -> SELECT result: aggregates, HAVING, projection,
    DISTINCT, ORDER/OFFSET/LIMIT."""
    if ast.aggs:
        exprs = []
        for a in ast.aggs:
            if a.func == "count":
                if a.var is None:
                    e = F.count(F.lit(1))
                elif a.distinct:
                    e = F.count_distinct(F.col(a.var))
                else:
                    e = F.count(F.col(a.var))
                e = e.cast("long")
            elif a.func == "sample":
                if a.distinct:
                    raise ValueError(
                        "sparql: DISTINCT SAMPLE is meaningless")
                e = F.first(F.col(a.var), ignorenulls=True)
            elif a.func == "group_concat":
                # SPARQL leaves the order unspecified; sort for a
                # deterministic (and oracle-comparable) result
                vals = F.collect_set(F.col(a.var)) if a.distinct \
                    else F.collect_list(F.col(a.var))
                e = F.array_join(F.array_sort(vals), a.sep)
            else:
                if a.distinct:
                    raise ValueError(
                        "sparql: DISTINCT only supported in COUNT/"
                        "GROUP_CONCAT")
                e = getattr(F, a.func)(F.col(a.var))
            exprs.append(e.alias(a.alias))
        grouped = sol.groupBy(*ast.group_by) if ast.group_by \
            else sol.groupBy()
        out = grouped.agg(*exprs)
        for htoks in ast.having:
            out = out.where(_filter_expr(htoks, set(out.columns)))
        proj = (ast.select_vars or ast.group_by) + \
            [a.alias for a in ast.aggs]
        out = out.select(*proj)
    else:
        out = sol.select(*(ast.select_vars
                           or sorted(_var_cols(sol.columns))))
        if ast.distinct:
            out = out.dropDuplicates()
    if ast.order_by:
        out = out.orderBy(*[F.col(v).asc() if asc else F.col(v).desc()
                            for v, asc in ast.order_by])
    if ast.offset:
        out = out.offset(ast.offset)
    if ast.limit is not None:
        out = out.limit(ast.limit)
    return out


def _compile_group(triples: DataFrame, g: Group, max_path_depth: int,
                   kinds: frozenset) -> DataFrame | None:
    sol = _join_patterns(triples, g.patterns, max_path_depth, kinds)
    for sq in g.subselects:
        inner = _compile_group(triples, sq.where, max_path_depth, kinds)
        if inner is None:
            raise ValueError("sparql: empty subquery WHERE group")
        sdf = _select_result(inner, sq)   # projected vars only
        if sol is None:
            sol = sdf
        else:
            shared = [c for c in sdf.columns if c in sol.columns]
            sol = sol.join(sdf, on=shared) if shared \
                else sol.crossJoin(sdf)
    for branches in g.unions:
        dfs = [_compile_group(triples, b, max_path_depth, kinds)
               for b in branches]
        if any(d is None for d in dfs):
            raise ValueError("sparql: empty UNION branch")
        cols = sorted({c for d in dfs for c in d.columns})
        udf_ = _null_pad(dfs[0], cols)
        for d in dfs[1:]:
            udf_ = udf_.unionByName(_null_pad(d, cols))
        if sol is None:
            sol = udf_
        else:
            shared = [c for c in _var_cols(udf_.columns)
                      if c in sol.columns]
            udf_ = _drop_dup_shadows(udf_, set(sol.columns))
            sol = sol.join(udf_, on=shared) if shared \
                else sol.crossJoin(udf_)
    for opt in g.optionals:
        if sol is None:
            raise ValueError("sparql: OPTIONAL without a base pattern")
        odf = _compile_group(triples, opt, max_path_depth, kinds)
        if odf is None:
            continue
        shared = [c for c in _var_cols(odf.columns) if c in sol.columns]
        odf = _drop_dup_shadows(odf, set(sol.columns))
        sol = sol.join(odf, on=shared, how="left") if shared \
            else sol.crossJoin(odf)
    for names, rows in g.values:
        vdf = _values_df(triples.sparkSession, names, rows)
        if sol is None:
            sol = vdf
            continue
        shared = [c for c in names if c in sol.columns]
        # an inline table is tiny by construction => broadcast
        sol = sol.join(F.broadcast(vdf), on=shared) if shared \
            else sol.crossJoin(F.broadcast(vdf))
    for toks, var in g.binds:
        if sol is None:
            raise ValueError("sparql: BIND without a base pattern")
        sol = _apply_bind(sol, toks, var, kinds)
    for positive, eg in g.exists:
        if sol is None:
            raise ValueError("sparql: EXISTS without a base pattern")
        edf = _compile_group(triples, eg, max_path_depth, kinds)
        shared = [c for c in _var_cols(edf.columns) if c in sol.columns]
        if not shared:
            raise ValueError(
                "sparql: [NOT] EXISTS must share a variable with the "
                "outer group")
        edf = edf.select(*shared).dropDuplicates()
        sol = sol.join(edf, on=shared,
                       how="left_semi" if positive else "left_anti")
    for mg in g.minuses:
        if sol is None:
            raise ValueError("sparql: MINUS without a base pattern")
        mdf = _compile_group(triples, mg, max_path_depth, kinds)
        shared = [c for c in _var_cols(mdf.columns) if c in sol.columns]
        if not shared:
            continue   # SPARQL spec: disjoint MINUS removes nothing
        sol = sol.join(mdf.select(*shared).dropDuplicates(),
                       on=shared, how="left_anti")
    for ftoks in g.filters:
        sol = sol.where(_filter_expr(ftoks, set(sol.columns)))
    return sol


def sparql_query(triples: DataFrame, query: str,
                 max_path_depth: int = 3) -> DataFrame:
    """Run a SPARQL query (see module docstring for the subset) against
    a (subj, pred, obj[, obj_is_uri], ...) triples DataFrame.

    SELECT -> one column per selected variable.
    CONSTRUCT -> (subj, pred, obj) rows, template-instantiated per
    solution, deduplicated (a CONSTRUCT result is a GRAPH — set
    semantics, like the reference's rdflib Graph result)."""
    ast = parse_sparql(query)
    kinds = _uses_shadows(ast.where)
    base = ["subj", "pred", "obj"]
    need = list(base)
    for kind, col in (("isuri", "obj_is_uri"), ("lang", "obj_lang")):
        if kind in kinds:
            if col not in triples.columns:
                raise ValueError(
                    f"sparql: this query needs the {col} column in the "
                    "triples DataFrame (operators/triples.py TRIPLES_COLS)")
            need.append(col)
    t = triples.select(*need)
    if ast.form == "describe":
        # all triples where the target is subject, plus inbound edges;
        # variable targets ("?"-prefixed) take their values from the
        # WHERE solution via semi joins — never a driver collect
        uris = [v for v in ast.select_vars if not v.startswith("?")]
        dvars = [v[1:] for v in ast.select_vars if v.startswith("?")]
        tt = t.select(*base)
        out = None
        if uris:
            out = tt.where(F.col("subj").isin(uris)
                           | F.col("obj").isin(uris))
        if dvars:
            sol = _compile_group(t, ast.where, max_path_depth, kinds)
            if sol is None:
                raise ValueError("sparql: empty DESCRIBE WHERE group")
            nodes = None
            for v in dvars:
                nv = sol.select(F.col(v).alias("__n")).dropDuplicates()
                nodes = nv if nodes is None \
                    else nodes.unionByName(nv).dropDuplicates()
            hits = (tt.join(nodes, tt.subj == F.col("__n"), "leftsemi")
                    .unionByName(
                        tt.join(nodes, tt.obj == F.col("__n"),
                                "leftsemi")))
            out = hits if out is None else out.unionByName(hits)
        if out is None:
            raise ValueError("sparql: DESCRIBE needs at least one target")
        return out.dropDuplicates()
    sol = _compile_group(t, ast.where, max_path_depth, kinds)
    if sol is None:
        raise ValueError("sparql: empty WHERE group")
    if ast.form == "ask":
        return (sol.limit(1)
                .agg(F.count(F.lit(1)).alias("n"))
                .select((F.col("n") > 0).alias("answer")))
    if ast.form == "select":
        return _select_result(sol, ast)
    # CONSTRUCT: one branch per template pattern
    branches = []
    for pat in ast.template:
        cols = []
        for term, name in ((pat.s, "subj"), (pat.p, "pred"),
                           (pat.o, "obj")):
            if term.kind == "var":
                if term.value not in sol.columns:
                    raise ValueError(
                        f"sparql: CONSTRUCT var ?{term.value} unbound")
                cols.append(F.col(term.value).alias(name))
            else:
                cols.append(F.lit(term.value).alias(name))
        branches.append(sol.select(*cols))
    out = branches[0]
    for b in branches[1:]:
        out = out.unionByName(b)
    # a constructed graph is a set of triples; template slots bound to
    # NULL (e.g. from an OPTIONAL) produce no triple, as in SPARQL
    return (out.where(F.col("subj").isNotNull()
                      & F.col("pred").isNotNull()
                      & F.col("obj").isNotNull())
            .dropDuplicates())
