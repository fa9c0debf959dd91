"""Differential gate for the SPARQL compiler (operators/sparql.py):
an INDEPENDENT naive evaluator (nested-loop enumeration over the
triple list, no Spark, no shared code) must agree with the compiled
DataFrame plan on randomized graphs and a pool of query shapes.

The naive evaluator implements the same algebra the compiler's module
docstring specifies (patterns joined on shared vars -> UNION branches
joined in -> OPTIONALs left-joined -> BINDs -> FILTERs), with bag
semantics — the same twin strategy the repo uses for the scalar
function library (tests/test_scalars.py)."""

import itertools
import random

import pytest

from ferenda_spark.operators.sparql import parse_sparql, sparql_query

DCT = "http://purl.org/dc/terms/"


# ---------------------------------------------------------------------------
# naive evaluator (pure Python, written against the SPARQL spec subset —
# intentionally shares NO code with the compiler)

def _match_pattern(triples, pat, binding):
    """All extensions of ``binding`` by one triple matching ``pat``."""
    out = []
    for (s, p, o) in triples:
        b = dict(binding)
        ok = True
        for term, val in ((pat.s, s), (pat.p, p), (pat.o, o)):
            if term.kind == "var":
                if term.value in b and b[term.value] != val:
                    ok = False
                    break
                b[term.value] = val
            elif term.value != val:
                ok = False
                break
        if ok:
            out.append(b)
    return out


def _eval_bgp(triples, patterns, bindings):
    for pat in patterns:
        nxt = []
        for b in bindings:
            nxt.extend(_match_pattern(triples, pat, b))
        bindings = nxt
    return bindings


def _join(left, right):
    out = []
    for lb in left:
        for rb in right:
            if all(lb[k] == rb[k] for k in lb.keys() & rb.keys()
                   if lb[k] is not None and rb[k] is not None):
                m = dict(lb)
                m.update({k: v for k, v in rb.items() if v is not None})
                out.append(m)
    return out


def _left_join(left, right):
    out = []
    rvars = set().union(*(rb.keys() for rb in right)) if right else set()
    for lb in left:
        matches = [rb for rb in right
                   if all(lb[k] == rb[k] for k in lb.keys() & rb.keys()
                          if lb[k] is not None)]
        if matches:
            for rb in matches:
                m = dict(lb)
                m.update(rb)
                out.append(m)
        else:
            m = dict(lb)
            m.update({v: None for v in rvars - lb.keys()})
            out.append(m)
    return out


def _eval_filter(toks, b):
    """Evaluate the tiny FILTER subset the fuzz pool uses:
    ?x = ?y | ?x != ?y | ?x = "lit" | ?x != "lit" | bound(?x)."""
    if toks[0].lower() == "bound":
        return b.get(toks[2][1:]) is not None
    lhs = b.get(toks[0][1:])
    rhs = toks[2][1:-1] if toks[2].startswith('"') else \
        toks[2][1:-1] if toks[2].startswith("<") else b.get(toks[2][1:])
    if lhs is None or rhs is None:
        return False
    return (lhs == rhs) if toks[1] == "=" else (lhs != rhs)


def _eval_group(triples, g):
    sol = _eval_bgp(triples, g.patterns, [dict()]) if g.patterns else None
    for branches in g.unions:
        udf = []
        branch_sols = [_eval_group(triples, b) for b in branches]
        allvars = set().union(*(set().union(*(bb.keys() for bb in bs))
                                if bs else set() for bs in branch_sols))
        for bs in branch_sols:
            for b in bs:
                m = {v: b.get(v) for v in allvars}
                udf.append(m)
        sol = udf if sol is None else _join(sol, udf)
    for opt in g.optionals:
        osol = _eval_group(triples, opt)
        sol = _left_join(sol, osol)
    for ftoks in g.filters:
        sol = [b for b in sol if _eval_filter(ftoks, b)]
    return sol


def naive_select(triples, query):
    ast = parse_sparql(query)
    sol = _eval_group(triples, ast.where)
    rows = [tuple(b.get(v) for v in ast.select_vars) for b in sol]
    if ast.distinct:
        rows = list(set(rows))
    return sorted(rows, key=lambda r: tuple(x or "" for x in r))


# ---------------------------------------------------------------------------
# randomized graphs x query pool

SUBJECTS = ["http://e/a", "http://e/b", "http://e/c"]
PREDS = [DCT + "title", DCT + "isPartOf", DCT + "references"]
OBJS = ["X", "Y", "http://e/a", "http://e/b"]

QUERY_POOL = [
    # plain BGP joins
    """SELECT ?s ?o WHERE { ?s <%(p0)s> ?o }""",
    """SELECT ?s ?t WHERE { ?s <%(p0)s> ?o . ?o <%(p1)s> ?t }""",
    """SELECT ?s WHERE { ?s <%(p0)s> "X" . ?s <%(p1)s> ?y }""",
    # shared-var self join
    """SELECT ?x ?y WHERE { ?x <%(p0)s> ?y . ?y <%(p0)s> ?x }""",
    # OPTIONAL null-pad
    """SELECT ?s ?t WHERE { ?s <%(p0)s> ?o .
       OPTIONAL { ?s <%(p1)s> ?t } }""",
    # OPTIONAL + bound filter
    """SELECT ?s WHERE { ?s <%(p0)s> ?o .
       OPTIONAL { ?s <%(p1)s> ?t } FILTER(bound(?t)) }""",
    # UNION with disjoint vars
    """SELECT ?a ?b WHERE {
       { ?x <%(p0)s> ?a } UNION { ?x <%(p1)s> ?b } }""",
    # UNION joined to a base pattern on the shared var
    """SELECT ?x ?v WHERE { ?x <%(p2)s> ?z .
       { ?x <%(p0)s> ?v } UNION { ?x <%(p1)s> ?v } }""",
    # equality / inequality filters
    """SELECT ?s ?o WHERE { ?s <%(p0)s> ?o . FILTER(?o != "X") }""",
    """SELECT ?s WHERE { ?s <%(p0)s> ?o . ?s <%(p1)s> ?o }""",
    # DISTINCT projection
    """SELECT DISTINCT ?o WHERE { ?s <%(p0)s> ?o }""",
]


def _random_graph(rng, n):
    return sorted({(rng.choice(SUBJECTS), rng.choice(PREDS),
                    rng.choice(OBJS)) for _ in range(n)})


@pytest.mark.parametrize("seed", range(8))
def test_compiler_agrees_with_naive_evaluator(spark, seed):
    rng = random.Random(seed)
    triples = _random_graph(rng, rng.randint(4, 12))
    df = spark.createDataFrame(
        triples, "subj string, pred string, obj string")
    perms = list(itertools.permutations(PREDS))
    for qt in QUERY_POOL:
        p0, p1, p2 = perms[seed % len(perms)]
        q = qt % {"p0": p0, "p1": p1, "p2": p2}
        expected = naive_select(triples, q)
        got = sorted((tuple(r) for r in sparql_query(df, q).collect()),
                     key=lambda r: tuple(x or "" for x in r))
        assert got == expected, (
            f"seed={seed} query={q!r}\n got={got}\n expected={expected}\n"
            f" graph={triples}")
