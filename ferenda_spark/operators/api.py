"""REST query-API semantics (SURVEY §3.3: GET /api/?q=…&facet=…&_stats)
as Spark computations over the triples table — the engine twin of the
reference's wsgiapp query endpoint (wsgiapp.py:248-571), validated
against its committed response goldens
(test/files/api/basicapi-*.json; tests/test_reference_parity.py).

- ``stats_dataset``: the ';stats' response — per-dimension observation
  counts over documents (rdf:type as prefixed term, dcterms:publisher
  as ref, dcterms:issued bucketed by year)
- ``faceted_query``: parameter-filtered document hits with pivoted
  metadata, paged, as the API's items list

Both run as DataFrame aggregations (groupBy + conditional-aggregation
pivot — one shuffle each); only the final, page-sized result is
collected to build the JSON envelope."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ferenda_spark import ns

_QNAME_PREFIXES = sorted(ns.NS.items(), key=lambda kv: -len(kv[1]))


def _qname(uri: str, extra: dict[str, str] | None = None) -> str:
    pairs = list((extra or {}).items()) + [
        (p, b) for p, b in _QNAME_PREFIXES]
    for pfx, base in sorted(pairs, key=lambda kv: -len(kv[1])):
        if uri.startswith(base):
            return f"{pfx}:{uri[len(base):]}"
    return uri


def stats_dataset(triples: DataFrame) -> dict:
    """The ';stats' DataSet response (wsgiapp.py stats endpoint):
    document counts per rdf:type term, publisher ref and issued year —
    one aggregation per dimension over the distinct (subj, value)
    pairs."""
    dims = [
        ("rdf_type", ns.RDF_TYPE,
         lambda v: {"term": _qname(v)}),
        ("dcterms_publisher", ns.DCT_PUBLISHER,
         lambda v: {"ref": v}),
        ("dcterms_issued", ns.DCT_ISSUED,
         lambda v: {"year": v[:4]}),
    ]
    # documents only: fragment subjects (#S1 parts) are not dataset rows
    docs = triples.where(~F.col("subj").contains("#"))
    slices = []
    for name, pred, shape in dims:
        vals = (docs.where(F.col("pred") == pred)
                .select("subj",
                        (F.substring("obj", 1, 4) if name == "dcterms_issued"
                         else F.col("obj")).alias("v"))
                .distinct()
                .groupBy("v").agg(F.count("*").alias("n"))
                .orderBy("v")
                .collect())
        obs = []
        for r in vals:
            o = shape(r.v) if name != "dcterms_issued" else {"year": r.v}
            o["count"] = r.n
            obs.append(o)
        slices.append({"dimension": name, "observations": obs})
    return {"type": "DataSet", "slices": slices}


def faceting_dataset(repo_facets: list[tuple[list, DataFrame]],
                     prefixes: dict[str, str] | None = None) -> dict:
    """The multi-repo ';stats' faceting response (wsgiapp.py:248-402
    over several repos' facet declarations, as exercised by the
    reference's advancedapi goldens): each repo contributes its
    statistics-capable facets (URI/Resource/Datetime/Boolean/Keyword/
    Value index types; Text/Label and multi-valued Resource facets are
    not statistics dimensions), dimensions merge across repos in
    declaration order, observations count distinct (document, value)
    pairs.

    ``repo_facets``: [(facet_config, triples_df), ...] where
    facet_config = [(dimension_name, predicate_uri, kind), ...] and
    kind in 'term' | 'ref' | 'year' | 'bool' | 'keyword' | 'value'
    | 'april' (the is_april_fools custom selector: bucket by whether
    the date is April 1st)."""
    from collections import OrderedDict

    dims: "OrderedDict[str, tuple[str, list]]" = OrderedDict()
    for facets, triples in repo_facets:
        docs = triples.where(~F.col("subj").contains("#"))
        for dimension, pred, kind in facets:
            v = F.col("obj")
            if kind == "year":
                v = F.substring("obj", 1, 4)
            elif kind == "april":
                v = (F.substring("obj", 6, 5) == "04-01").cast("string")
            rows = (docs.where(F.col("pred") == pred)
                    .select("subj", v.alias("v")).distinct().collect())
            dims.setdefault(dimension, (kind, []))[1].extend(
                (r.v for r in rows))
    slices = []
    for dimension, (kind, values) in dims.items():
        counts: dict = {}
        for v in values:
            counts[v] = counts.get(v, 0) + 1
        obs = []
        for v in sorted(counts):
            if kind == "term":
                o = {"term": _qname(v, prefixes)}
            elif kind == "ref":
                o = {"ref": v}
            elif kind == "year":
                o = {"year": v}
            elif kind in ("bool", "april"):
                o = {"value": v == "true"}
            else:
                o = {"value": v}
            o["count"] = counts[v]
            obs.append(o)
        slices.append({"dimension": dimension, "observations": obs})
    return {"type": "DataSet", "slices": slices}


def advanced_query(triples: DataFrame, facet_fields: list,
                   params: dict[str, str],
                   labels: dict[str, str] | None = None,
                   stats_facets: list | None = None,
                   prefixes: dict[str, str] | None = None,
                   page: int = 0, page_size: int = 10,
                   path: str = "/myapi/") -> dict:
    """Typed faceted query (wsgiapp.py:404-571 over a repo with custom
    facets, as the advancedapi goldens exercise): items carry their
    facet-typed fields (booleans, keyword lists, resource refs with
    labels), parameters filter by equality, keyword membership,
    ``min-``/``max-`` ranges and ``year-`` buckets; ``_stats=on``
    embeds the faceting DataSet computed over the HIT SET (dimensions
    declared by the facet config appear even when empty).  Hits order
    by dcterms_issued descending (the reference backend's observable
    order in the goldens).

    ``facet_fields``: [(field, predicate_uri, kind)] with kind in
    'uri' | 'text' | 'date' | 'bool' | 'keyword' | 'april' | 'ref'."""
    from urllib.parse import quote

    labels = labels or {}
    docs = triples.where(~F.col("subj").contains("#"))
    aggs = []
    for field, pred, kind in facet_fields:
        base = F.when(F.col("pred") == pred, F.col("obj"))
        if kind == "keyword":
            aggs.append(F.sort_array(F.collect_list(base)).alias(field))
        else:
            aggs.append(F.max(base).alias(field))
    pivot = docs.groupBy("subj").agg(*aggs)

    kinds = {f: k for f, _, k in facet_fields}
    for key, val in params.items():
        if key == "_stats":
            continue
        if key == "uri":
            pivot = (pivot.where(F.col("subj").endswith(val[1:]))
                     if val.startswith("*")
                     else pivot.where(F.col("subj") == val))
        elif key.startswith("min-"):
            # exclusive bounds: the reference backend issues gt/lt
            # range queries (observable in the committed range golden)
            pivot = pivot.where(F.col(key[4:]) > val)
        elif key.startswith("max-"):
            pivot = pivot.where(F.col(key[4:]) < val)
        elif key.startswith("year-"):
            pivot = pivot.where(
                F.substring(F.col(key[5:]), 1, 4) == val)
        elif kinds.get(key) == "keyword":
            pivot = pivot.where(F.array_contains(F.col(key), val))
        elif kinds.get(key) == "april":
            want = "04-01" if val == "true" else None
            col = F.substring(F.col(key), 6, 5)
            pivot = pivot.where(col == "04-01" if val == "true"
                                else col != "04-01")
        else:
            pivot = pivot.where(F.col(key) == val)
    rows = pivot.orderBy(F.desc("dcterms_issued"), F.asc("subj")).collect()
    items = []
    for r in rows:
        item: dict = {"iri": r.subj}
        for field, pred, kind in facet_fields:
            v = r[field]
            if kind == "bool":
                item[field] = v == "true"
            elif kind == "april":
                item["aprilfools"] = (v or "")[5:10] == "04-01"
            elif kind == "keyword":
                item[field] = list(v)
            elif kind == "ref":
                item[field] = {"iri": v, "label": labels.get(v, v)}
            else:
                item[field] = v
        items.append(item)
    qs = "&".join(f"{k}={quote(v, safe='*')}" for k, v in params.items())
    out = {
        "current": f"{path}?{qs}",
        "duration": None,
        "items": items[page * page_size:(page + 1) * page_size],
        "itemsPerPage": page_size,
        "startIndex": page * page_size,
        "totalResults": len(items),
    }
    if params.get("_stats") == "on" and stats_facets is not None:
        hit_triples = triples.join(
            F.broadcast(pivot.select("subj")), "subj", "left_semi")
        out["statistics"] = faceting_dataset(
            [(stats_facets, hit_triples)], prefixes=prefixes)
    return out


def parsed_doc_text(xhtml: bytes) -> dict[str, str]:
    """Document-level body text per resource from a parsed XHTML+RDFa
    file: text directly under an ``about`` scope belongs to that
    resource; nested about-divs start their own scope (the reference
    indexes parts separately — fulltextindex.py update flow)."""
    from ferenda_spark import htmlparse as hp

    tree = hp.parse_html(xhtml.decode("utf-8"))
    out: dict[str, list[str]] = {}

    def walk(node, scope):
        about = node.attrs.get("about") if isinstance(node, hp.Node) else None
        if about:
            scope = about
        for c in getattr(node, "children", []):
            if isinstance(c, str):
                if scope and c.strip():
                    out.setdefault(scope, []).append(c.strip())
            else:
                if c.tag in ("head", "title", "script"):
                    continue
                walk(c, scope)

    walk(tree, None)
    return {k: " ".join(v) for k, v in out.items()}


def fulltext_query(triples: DataFrame, texts: DataFrame, q: str,
                   params: dict[str, str] | None = None,
                   page: int = 0, page_size: int = 10,
                   path: str = "/myapi/") -> dict:
    """Free-text query (wsgiapp.py:404-571): hits in a document's own
    body text or title, combinable with facet parameter filters.  Body
    hits carry an ES-flavored highlight fragment (from the match to a
    ~100-char window, <em class="match"> wrapped — the committed
    basicapi goldens' shape); title hits carry no fragment."""
    from urllib.parse import quote

    env = faceted_query(triples, params or {}, page=page,
                        page_size=10**9, path=path)
    text_by_iri = {r.iri: r.text for r in texts.collect()}
    items = []
    for item in env["items"]:
        text = text_by_iri.get(item["iri"], "")
        title = item.get("dcterms_title") or ""
        tpos = text.find(q)
        if tpos >= 0:
            frag = text[tpos:tpos + 100]
            frag = frag.replace(q, f'<em class="match">{q}</em>', 1)
            item = dict(item, matches={"text": frag})
        elif q not in title:
            continue
        items.append(item)
    qs = "&".join([f"q={quote(q, safe='*')}"] +
                  [f"{k}={quote(v, safe='*')}"
                   for k, v in (params or {}).items()])
    return {
        "current": f"{path}?{qs}",
        "duration": None,
        "items": items[page * page_size:(page + 1) * page_size],
        "itemsPerPage": page_size,
        "startIndex": page * page_size,
        "totalResults": len(items),
    }


def faceted_query(triples: DataFrame, params: dict[str, str],
                  page: int = 0, page_size: int = 10,
                  path: str = "/myapi/") -> dict:
    """Parameter-filtered document list (wsgiapp.py:404-571): pivot the
    per-document metadata, apply '*'-wildcard parameter filters, page.
    ``params`` e.g. {'dcterms_publisher': '*/publisher/A'}."""
    from urllib.parse import quote

    preds = {
        "rdf_type": ns.RDF_TYPE,
        "dcterms_title": ns.DCT_TITLE,
        "dcterms_identifier": ns.DCT_IDENTIFIER,
        "dcterms_issued": ns.DCT_ISSUED,
        "dcterms_publisher": ns.DCT_PUBLISHER,
    }
    triples = triples.where(~F.col("subj").contains("#"))
    pivot = triples.groupBy("subj").agg(*[
        F.max(F.when(F.col("pred") == p, F.col("obj"))).alias(k)
        for k, p in preds.items()])
    for key, pat in params.items():
        col = F.col(key)
        if pat.startswith("*"):
            pivot = pivot.where(col.endswith(pat[1:]))
        else:
            pivot = pivot.where(col == pat)
    total = pivot.count()
    rows = (pivot.orderBy("subj")
            .offset(page * page_size).limit(page_size).collect())
    items = []
    for r in rows:
        items.append({
            "iri": r.subj,
            "rdf_type": r.rdf_type,
            "dcterms_title": r.dcterms_title,
            "dcterms_identifier": r.dcterms_identifier,
            "dcterms_issued": r.dcterms_issued,
            "dcterms_publisher": {"iri": r.dcterms_publisher,
                                  "label": r.dcterms_publisher},
        })
    qs = "&".join(f"{k}={quote(v, safe='*')}" for k, v in params.items())
    return {
        "current": path + ("?" + qs if qs else ""),
        "duration": None,
        "items": items,
        "itemsPerPage": page_size,
        "startIndex": page * page_size,
        "totalResults": total,
    }
