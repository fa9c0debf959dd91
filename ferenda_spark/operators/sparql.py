"""SPARQL BGP -> DataFrame compiler: the engine-native counterpart of
the reference's triplestore query surface.

The reference answers annotation/describe queries by POSTing SPARQL to
an external triplestore (``construct_annotations`` ->
``TripleStore.construct``, /root/reference/ferenda/documentrepository.py:
2471-2488, template /root/reference/ferenda/res/sparql/annotations.rq)
and ships per-repo query templates.  Here the triple table IS a
DataFrame, so the same queries compile to a Catalyst join plan instead
of leaving the engine.

Supported subset (everything the reference's shipped templates use,
plus the common SELECT forms):

* ``PREFIX`` declarations, ``a`` for rdf:type
* ``SELECT ?v ... WHERE { ... }`` (incl. ``*``), ``DISTINCT``,
  ``ORDER BY``, ``LIMIT``
* aggregates ``(COUNT([DISTINCT] ?v|*) AS ?n)`` / SUM / MIN / MAX /
  AVG with ``GROUP BY`` -> groupBy().agg() (map-side partial
  aggregation for free)
* ``CONSTRUCT { template } WHERE { ... }`` -> a (subj, pred, obj)
  DataFrame (one union branch per template pattern)
* ``ASK { ... }`` -> one boolean ``answer`` row;
  ``DESCRIBE <uri>...`` -> the IRIs' outbound + inbound triples
* basic graph patterns joined on shared variables
* ``OPTIONAL { ... }`` -> left outer join
* ``{ ... } UNION { ... }`` -> unionByName with null-padded unbound vars
* ``FILTER (...)`` with =, !=, <, <=, >, >=, &&, ||, !, regex(?v,"re"),
  bound(?v), str(?v)
* property paths ``p*`` / ``p+`` (bounded closure, default depth 3 —
  the reference's part trees nest S / S.1 / S.1.1, same bound as
  operators/canonicalize.annotation_closure)

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
* ``p*``/``p+`` closures are ``max_path_depth`` chained self-joins of
  the edge subset (one pred-filtered scan reused), not a driver loop
  over collected rows.
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
        |FILTER|DISTINCT|ORDER|BY|LIMIT|ASC|DESC|a)(?![A-Za-z0-9_]))
    | (?P<ident>[A-Za-z_][A-Za-z0-9_]*)   # FILTER function names
    | (?P<punct>&&|\|\||!=|<=|>=|[{}().;,*+=<>!])
    )""",
    re.X | re.I)


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
    p: Term
    o: Term
    path: str | None = None  # None | '*' | '+'


@dataclass
class Group:
    patterns: list = field(default_factory=list)   # Pattern | Group ops
    optionals: list = field(default_factory=list)  # [Group]
    unions: list = field(default_factory=list)     # [(Group, Group)]
    filters: list = field(default_factory=list)    # [token list]


@dataclass
class Agg:
    func: str        # count | sum | min | max | avg
    var: str | None  # None = COUNT(*)
    alias: str
    distinct: bool = False


@dataclass
class Query:
    form: str                 # select | construct
    select_vars: list[str]    # [] means *
    distinct: bool
    template: list[Pattern]   # construct template
    where: Group
    order_by: list[tuple[str, bool]]  # (var, ascending)
    limit: int | None
    aggs: list[Agg] = field(default_factory=list)
    group_by: list[str] = field(default_factory=list)


RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"


class _Parser:
    def __init__(self, toks: list[str]):
        self.toks = toks
        self.i = 0
        self.prefixes: dict[str, str] = {}

    def peek(self) -> str | None:
        return self.toks[self.i] if self.i < len(self.toks) else None

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

    def term(self) -> Term:
        t = self.next()
        if t.startswith("?"):
            return Term("var", t[1:])
        if t.startswith("<"):
            return Term("iri", t[1:-1])
        if t.startswith('"'):
            return Term("lit", t[1:-1].replace('\\"', '"'))
        if t == "a":
            return Term("iri", RDF_TYPE)
        if ":" in t:
            pfx, local = t.split(":", 1)
            if pfx not in self.prefixes:
                raise ValueError(f"sparql: unknown prefix {pfx!r}")
            return Term("iri", self.prefixes[pfx] + local)
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
            # DESCRIBE <uri>... — no WHERE group needed
            uris = []
            while self.peek():
                t = self.term()
                if t.kind != "iri":
                    raise ValueError("sparql: DESCRIBE takes IRIs")
                uris.append(t.value)
            return Query("describe", [u for u in uris], False, [],
                         Group(), [], None)
        if form not in ("SELECT", "CONSTRUCT", "ASK"):
            raise ValueError(f"sparql: unsupported form {form}")
        select_vars: list[str] = []
        aggs: list[Agg] = []
        distinct = False
        template: list[Pattern] = []
        if form == "SELECT":
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
            self.expect("WHERE")
        elif form == "CONSTRUCT":
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
        order_by: list[tuple[str, bool]] = []
        group_by: list[str] = []
        limit = None
        while self.peek():
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
            else:
                raise ValueError(f"sparql: unexpected trailing {t!r}")
        return Query(form.lower(), select_vars, distinct, template,
                     where, order_by, limit, aggs, group_by)

    def _agg(self) -> Agg:
        func = self.next().lower()
        if func not in ("count", "sum", "min", "max", "avg"):
            raise ValueError(f"sparql: unsupported aggregate {func!r}")
        self.expect("(")
        adist = False
        if self.peek() and self.peek().upper() == "DISTINCT":
            self.next()
            adist = True
        v = self.next()
        var = None if v == "*" else v[1:]
        self.expect(")")
        as_kw = self.next()
        if as_kw.upper() != "AS":
            raise ValueError(f"sparql: expected AS, got {as_kw!r}")
        alias = self.next()
        if not alias.startswith("?"):
            raise ValueError("sparql: aggregate alias must be a ?var")
        self.expect(")")
        return Agg(func, var, alias[1:], adist)

    def pattern_list(self) -> list[Pattern]:
        pats: list[Pattern] = []
        while self.peek() and self.peek() != "}":
            pats.append(self.pattern())
            if self.peek() == ".":
                self.next()
        return pats

    def pattern(self) -> Pattern:
        s = self.term()
        p = self.term()
        path = None
        if self.peek() in ("*", "+"):
            path = self.next()
        o = self.term()
        return Pattern(s, p, o, path)

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
                g.filters.append(self._filter_tokens())
            elif t == "{":
                self.next()
                left = self.group()
                self.expect("}")
                self.expect("UNION")
                self.expect("{")
                right = self.group()
                self.expect("}")
                g.unions.append((left, right))
            elif t == ".":
                self.next()
            else:
                g.patterns.append(self.pattern())
        return g

    def _filter_tokens(self) -> list[str]:
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
            toks.append(t)
        return toks


def parse_sparql(q: str) -> Query:
    return _Parser(_tokenize(q)).parse()


# ---------------------------------------------------------------------------
# compilation

def _filter_expr(toks: list[str], cols: set[str]) -> Column:
    """Translate a FILTER token list to a Spark SQL expression over the
    solution's variable columns.  Tokens were produced by our own
    tokenizer, so rebuilding the expression string is injection-safe:
    variables map to backticked columns, everything else is a vetted
    operator/function/literal token."""
    parts: list[str] = []
    i = 0
    while i < len(toks):
        t = toks[i]
        if t.startswith("?"):
            v = t[1:]
            if v not in cols:
                raise ValueError(f"sparql: FILTER on unbound ?{v}")
            parts.append(f"`{v}`")
        elif t.startswith('"'):
            parts.append("'" + t[1:-1].replace("'", "''") + "'")
        elif t == "=":
            parts.append("=")
        elif t in ("!=", "<", "<=", ">", ">=", "(", ")", ","):
            parts.append(t)
        elif t == "&&":
            parts.append("AND")
        elif t == "||":
            parts.append("OR")
        elif t == "!":
            parts.append("NOT")
        elif re.fullmatch(r"-?\d+(\.\d+)?", t):
            parts.append(t)
        elif t.lower() == "regex":
            # regex(?v, "pat") -> ?v rlike 'pat'; consumes '( ?v , "p" )'
            v, pat = toks[i + 2], toks[i + 4]
            parts.append(f"`{v[1:]}` RLIKE '" +
                         pat[1:-1].replace("'", "''") + "'")
            i += 6
            continue
        elif t.lower() == "bound":
            v = toks[i + 2]          # consumes '( ?v )'
            parts.append(f"`{v[1:]}` IS NOT NULL")
            i += 4
            continue
        elif t.lower() == "str":
            v = toks[i + 2]          # consumes '( ?v )'
            parts.append(f"CAST(`{v[1:]}` AS STRING)")
            i += 4
            continue
        else:
            raise ValueError(f"sparql: unsupported FILTER token {t!r}")
        i += 1
    return F.expr(" ".join(parts))


def _pattern_df(triples: DataFrame, pat: Pattern, max_path_depth: int,
                ) -> tuple[DataFrame, int]:
    """One triple pattern -> (projected scan keyed by its variable
    columns, n_bound_constants).  Constants become pushdown filters."""
    if pat.path:
        return _path_df(triples, pat, max_path_depth)
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
    out = df.select(*[F.col(c).alias(v) for v, c in sel.items()])
    return out, n_bound


def _path_df(triples: DataFrame, pat: Pattern, max_path_depth: int,
             ) -> tuple[DataFrame, int]:
    """``?s p* ?o`` / ``p+``: bounded closure of the p-edge subset.
    ``*`` includes the zero-length path (every node reaches itself —
    for a constant endpoint that is just the constant row; for the
    var-var form the node set of the p-subgraph)."""
    if pat.p.kind == "var":
        raise ValueError("sparql: property path needs a constant predicate")
    edges = (triples.where(F.col("pred") == pat.p.value)
             .select(F.col("subj").alias("_s"), F.col("obj").alias("_o"))
             .dropDuplicates())
    closure = edges
    frontier = edges
    for _ in range(max_path_depth - 1):
        frontier = (frontier.alias("f")
                    .join(edges.alias("e"),
                          F.col("f._o") == F.col("e._s"))
                    .select(F.col("f._s").alias("_s"),
                            F.col("e._o").alias("_o")))
        closure = closure.unionByName(frontier).dropDuplicates()
    if pat.path == "*":
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
        closure = closure.unionByName(zero).dropDuplicates()

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
    return df.select(*[F.col(c).alias(v) for v, c in sel.items()]), n_bound


def _join_patterns(triples: DataFrame, pats: list[Pattern],
                   max_path_depth: int) -> DataFrame | None:
    if not pats:
        return None
    scans = [_pattern_df(triples, p, max_path_depth) for p in pats]
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
            if set(scans[i][0].columns) & set(sol.columns):
                pick = i
                break
        if pick is None:          # disconnected query: cartesian
            pick = next(i for i in order if not used[i])
            sol = sol.crossJoin(scans[pick][0])
        else:
            df, n_bound = scans[pick]
            shared = list(set(df.columns) & set(sol.columns))
            # a 2+-constant pattern is a needle => broadcast it
            sol = sol.join(F.broadcast(df) if n_bound >= 2 else df,
                           on=shared)
        used[pick] = True
        remaining -= 1
    return sol


def _null_pad(df: DataFrame, cols: list[str]) -> DataFrame:
    missing = [c for c in cols if c not in df.columns]
    for c in missing:
        df = df.withColumn(c, F.lit(None).cast("string"))
    return df.select(*cols)


def _compile_group(triples: DataFrame, g: Group,
                   max_path_depth: int) -> DataFrame | None:
    sol = _join_patterns(triples, g.patterns, max_path_depth)
    for left, right in g.unions:
        ldf = _compile_group(triples, left, max_path_depth)
        rdf = _compile_group(triples, right, max_path_depth)
        if ldf is None or rdf is None:
            raise ValueError("sparql: empty UNION branch")
        cols = sorted(set(ldf.columns) | set(rdf.columns))
        udf_ = _null_pad(ldf, cols).unionByName(_null_pad(rdf, cols))
        if sol is None:
            sol = udf_
        else:
            shared = list(set(udf_.columns) & set(sol.columns))
            sol = sol.join(udf_, on=shared) if shared \
                else sol.crossJoin(udf_)
    for opt in g.optionals:
        if sol is None:
            raise ValueError("sparql: OPTIONAL without a base pattern")
        odf = _compile_group(triples, opt, max_path_depth)
        if odf is None:
            continue
        shared = list(set(odf.columns) & set(sol.columns))
        sol = sol.join(odf, on=shared, how="left") if shared \
            else sol.crossJoin(odf)
    for ftoks in g.filters:
        sol = sol.where(_filter_expr(ftoks, set(sol.columns)))
    return sol


def sparql_query(triples: DataFrame, query: str,
                 max_path_depth: int = 3) -> DataFrame:
    """Run a SPARQL query (see module docstring for the subset) against
    a (subj, pred, obj, ...) triples DataFrame.

    SELECT -> one column per selected variable.
    CONSTRUCT -> (subj, pred, obj) rows, template-instantiated per
    solution, deduplicated (a CONSTRUCT result is a GRAPH — set
    semantics, like the reference's rdflib Graph result)."""
    ast = parse_sparql(query)
    t = triples.select("subj", "pred", "obj")
    if ast.form == "describe":
        # all triples where the IRI is subject, plus inbound edges
        uris = ast.select_vars
        return (t.where(F.col("subj").isin(uris)
                        | F.col("obj").isin(uris))
                .dropDuplicates())
    sol = _compile_group(t, ast.where, max_path_depth)
    if sol is None:
        raise ValueError("sparql: empty WHERE group")
    if ast.form == "ask":
        return (sol.limit(1)
                .agg(F.count(F.lit(1)).alias("n"))
                .select((F.col("n") > 0).alias("answer")))
    if ast.form == "select":
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
                else:
                    if a.distinct:
                        raise ValueError(
                            "sparql: DISTINCT only supported in COUNT")
                    e = getattr(F, a.func)(F.col(a.var))
                exprs.append(e.alias(a.alias))
            grouped = sol.groupBy(*ast.group_by) if ast.group_by \
                else sol.groupBy()
            out = grouped.agg(*exprs)
            proj = (ast.select_vars or ast.group_by) + \
                [a.alias for a in ast.aggs]
            out = out.select(*proj)
        else:
            out = sol.select(*(ast.select_vars or sorted(sol.columns)))
            if ast.distinct:
                out = out.dropDuplicates()
        if ast.order_by:
            out = out.orderBy(*[F.col(v).asc() if asc else F.col(v).desc()
                                for v, asc in ast.order_by])
        if ast.limit is not None:
            out = out.limit(ast.limit)
        return out
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
