"""SPARQL BGP -> DataFrame compiler (operators/sparql.py): the
engine-native counterpart of the reference's triplestore query surface
(construct_annotations, documentrepository.py:2471-2488; template
res/sparql/annotations.rq)."""

import pytest

from ferenda_spark.operators.sparql import (Pattern, parse_sparql,
                                            sparql_query)

DCT = "http://purl.org/dc/terms/"
ANNOTATIONS_RQ = "/root/reference/ferenda/res/sparql/annotations.rq"


# ---------------------------------------------------------------------------
# parser

def test_parse_reference_annotations_rq():
    """The reference's own shipped template parses to the expected
    shape: CONSTRUCT, 2 template patterns, ?s ?p ?o + a UNION whose
    left arm is one isPartOf* path and right arm path + references."""
    with open(ANNOTATIONS_RQ) as fp:
        rq = fp.read() % {"uri": "http://ex.org/doc/1"}
    ast = parse_sparql(rq)
    assert ast.form == "construct"
    assert len(ast.template) == 2
    assert ast.template[0].p.value == DCT + "isReferencedBy"
    g = ast.where
    assert [(p.s.value, p.p.value, p.o.value) for p in g.patterns] == \
        [("s", "p", "o")]
    (left, right), = g.unions
    assert left.patterns[0].path == "*"
    assert left.patterns[0].o.value == "http://ex.org/doc/1"
    assert right.patterns[1].p.value == DCT + "references"


def test_parse_select_full_surface():
    ast = parse_sparql("""
        PREFIX dct: <http://purl.org/dc/terms/>
        SELECT DISTINCT ?doc ?title WHERE {
          ?doc a <http://xmlns.com/foaf/0.1/Document> .
          ?doc dct:title ?title .
          OPTIONAL { ?doc dct:publisher ?pub }
          FILTER (?title != "x" && regex(?title, "^A"))
        } ORDER BY DESC(?title) LIMIT 10""")
    assert ast.select_vars == ["doc", "title"] and ast.distinct
    assert ast.order_by == [("title", False)] and ast.limit == 10
    assert len(ast.where.optionals) == 1
    assert ast.where.patterns[0].p.value.endswith("#type")


def test_parse_pname_keeps_statement_dot():
    # 'dct:title .' must tokenize as pname + period, not swallow the dot
    ast = parse_sparql("""PREFIX dct: <http://purl.org/dc/terms/>
        SELECT ?t WHERE { <http://e/d> dct:title ?t . }""")
    assert ast.where.patterns[0].p.value == DCT + "title"


def test_parse_errors():
    with pytest.raises(ValueError, match="unknown prefix"):
        parse_sparql("SELECT ?x WHERE { ?x nope:p ?y }")
    with pytest.raises(ValueError, match="unsupported form"):
        parse_sparql("INSERT { ?s ?p ?o } WHERE { ?s ?p ?o }")


def test_parse_aggregates():
    ast = parse_sparql("""SELECT ?p (COUNT(*) AS ?n)
        (MAX(?o) AS ?top) WHERE { ?s ?p ?o } GROUP BY ?p""")
    assert ast.select_vars == ["p"] and ast.group_by == ["p"]
    assert [(a.func, a.var, a.alias) for a in ast.aggs] == \
        [("count", None, "n"), ("max", "o", "top")]
    ast2 = parse_sparql(
        "SELECT (COUNT(DISTINCT ?s) AS ?n) WHERE { ?s ?p ?o }")
    assert ast2.aggs[0].distinct and ast2.aggs[0].var == "s"


# ---------------------------------------------------------------------------
# execution over a small graph

@pytest.fixture()
def graph(spark):
    doc, part, sub = "http://e/d1", "http://e/d1#S1", "http://e/d1#S1.1"
    doc2 = "http://e/d2"
    rows = [
        (doc, "rdf:type", "foaf:Document"),
        (doc, DCT + "title", "Alpha"),
        (doc2, "rdf:type", "foaf:Document"),
        (doc2, DCT + "title", "Beta"),
        (part, DCT + "isPartOf", doc),
        (sub, DCT + "isPartOf", part),
        (part, DCT + "title", "Section 1"),
        (doc2, DCT + "references", sub),
    ]
    return spark.createDataFrame(rows, "subj string, pred string, obj string")


def test_select_join_filter(graph):
    rows = sparql_query(graph, """PREFIX dct: <http://purl.org/dc/terms/>
        SELECT ?d ?t WHERE {
          ?d <rdf:type> "foaf:Document" .
          ?d dct:title ?t .
          FILTER (regex(?t, "^A"))
        }""").collect()
    assert [(r.d, r.t) for r in rows] == [("http://e/d1", "Alpha")]


def test_optional_yields_null(graph):
    rows = {r.d: r.r for r in sparql_query(
        graph, """PREFIX dct: <http://purl.org/dc/terms/>
        SELECT ?d ?r WHERE {
          ?d <rdf:type> "foaf:Document" .
          OPTIONAL { ?d dct:references ?r }
        }""").collect()}
    assert rows["http://e/d2"] == "http://e/d1#S1.1"
    assert rows["http://e/d1"] is None


def test_filter_bound(graph):
    rows = sparql_query(graph, """PREFIX dct: <http://purl.org/dc/terms/>
        SELECT ?d WHERE {
          ?d <rdf:type> "foaf:Document" .
          OPTIONAL { ?d dct:references ?r }
          FILTER (bound(?r))
        }""").collect()
    assert [r.d for r in rows] == ["http://e/d2"]


def test_union_null_pads(graph):
    df = sparql_query(graph, """PREFIX dct: <http://purl.org/dc/terms/>
        SELECT ?t ?r WHERE {
          { ?x dct:title ?t } UNION { ?x dct:references ?r }
        }""")
    rows = df.collect()
    assert sorted(r.t for r in rows if r.t) == ["Alpha", "Beta", "Section 1"]
    assert [r.r for r in rows if r.r] == ["http://e/d1#S1.1"]


def test_path_star_includes_zero_length(graph):
    # ?part isPartOf* <doc>: the doc itself + both nested parts
    rows = sparql_query(graph, """PREFIX dct: <http://purl.org/dc/terms/>
        SELECT ?part WHERE { ?part dct:isPartOf* <http://e/d1> }""")
    assert sorted(r.part for r in rows.collect()) == [
        "http://e/d1", "http://e/d1#S1", "http://e/d1#S1.1"]


def test_path_plus_excludes_zero_length(graph):
    rows = sparql_query(graph, """PREFIX dct: <http://purl.org/dc/terms/>
        SELECT ?part WHERE { ?part dct:isPartOf+ <http://e/d1> }""")
    assert sorted(r.part for r in rows.collect()) == [
        "http://e/d1#S1", "http://e/d1#S1.1"]


def test_construct_reference_annotations(graph):
    """annotations.rq VERBATIM (uri = d1) over the fixture graph must
    produce: every triple of d1/its parts, plus the inbound-reference
    decoration and every triple of the referencing doc."""
    with open(ANNOTATIONS_RQ) as fp:
        rq = fp.read() % {"uri": "http://e/d1"}
    got = {(r.subj, r.pred, r.obj)
           for r in sparql_query(graph, rq).collect()}
    doc, part, sub = "http://e/d1", "http://e/d1#S1", "http://e/d1#S1.1"
    doc2 = "http://e/d2"
    expected = {
        # ?s in isPartOf* closure of d1: all their triples
        (doc, "rdf:type", "foaf:Document"),
        (doc, DCT + "title", "Alpha"),
        (part, DCT + "isPartOf", doc),
        (sub, DCT + "isPartOf", part),
        (part, DCT + "title", "Section 1"),
        # d2 references d1#S1.1 -> decoration + all of d2's triples
        (sub, DCT + "isReferencedBy", doc2),
        (doc2, "rdf:type", "foaf:Document"),
        (doc2, DCT + "title", "Beta"),
        (doc2, DCT + "references", sub),
    }
    assert got == expected


def test_construct_drops_null_slots(graph):
    # OPTIONAL-bound template var unmatched -> no triple emitted
    got = sparql_query(graph, """PREFIX dct: <http://purl.org/dc/terms/>
        CONSTRUCT { ?d dct:isReferencedBy ?r }
        WHERE {
          ?d <rdf:type> "foaf:Document" .
          OPTIONAL { ?r dct:references ?d }
        }""").collect()
    assert got == []  # nothing references a Document directly


def test_ask(graph):
    yes, = sparql_query(graph, """PREFIX dct: <http://purl.org/dc/terms/>
        ASK { ?s dct:references ?o }""").collect()
    no, = sparql_query(graph, """PREFIX dct: <http://purl.org/dc/terms/>
        ASK WHERE { ?s dct:creator ?o }""").collect()
    assert yes.answer is True and no.answer is False


def test_describe(graph):
    rows = {(r.subj, r.pred, r.obj) for r in
            sparql_query(graph, "DESCRIBE <http://e/d1#S1>").collect()}
    assert rows == {
        ("http://e/d1#S1", DCT + "isPartOf", "http://e/d1"),
        ("http://e/d1#S1", DCT + "title", "Section 1"),
        ("http://e/d1#S1.1", DCT + "isPartOf", "http://e/d1#S1"),
    }


def test_group_by_count(graph):
    rows = {r.p: r.n for r in sparql_query(
        graph, """SELECT ?p (COUNT(*) AS ?n) WHERE { ?s ?p ?o }
                  GROUP BY ?p""").collect()}
    assert rows["http://purl.org/dc/terms/isPartOf"] == 2
    assert rows["rdf:type"] == 2 and rows[DCT + "title"] == 3


def test_count_distinct_global(graph):
    row, = sparql_query(
        graph, "SELECT (COUNT(DISTINCT ?s) AS ?n) WHERE { ?s ?p ?o }"
    ).collect()
    assert row.n == 4  # d1, d2, part, sub


def test_broadcast_hint_for_selective_pattern(graph):
    # a non-seed pattern bound by 2 constants joins broadcast-hinted
    df = sparql_query(graph, """PREFIX dct: <http://purl.org/dc/terms/>
        SELECT ?x WHERE {
          ?x dct:isPartOf <http://e/d1> .
          ?x dct:title "Section 1" .
        }""")
    assert [r.x for r in df.collect()] == ["http://e/d1#S1"]
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Broadcast" in plan
