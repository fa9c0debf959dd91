"""Dev tool: compare engine triples against the reference's committed
distilled goldens for the 9 RFC fixtures.  (The pytest gate is
tests/test_reference_parity.py; this prints per-doc diffs.)

Usage: python tools/rfc_parity.py [basefile ...]
"""

from __future__ import annotations

import html
import os
import sys

sys.path.insert(0, ".")

REF = "/root/reference/test/files/repo/rfc"
EXTRA = "/root/reference/ferenda/sources/tech/res/extra/rfc.ttl"


def golden_basefiles():
    return sorted(
        f[:-4] for f in os.listdir(f"{REF}/distilled") if f.endswith(".ttl"))


def wrap_html(txt: str) -> bytes:
    return (f"<html><body><pre>{html.escape(txt)}</pre></body></html>"
            ).encode("utf-8")


def load_pages(basefiles):
    rows = []
    for bf in basefiles:
        txt = open(f"{REF}/downloaded/{bf}.txt", encoding="utf-8",
                   errors="replace").read()
        rows.append((f"http://localhost:8000/res/rfc/{bf}", None,
                     wrap_html(txt), None, None))
    return rows


def key(t):
    # compare (subj, pred, obj, lang, datatype); obj_is_uri folded in
    return (t["subj"], t["pred"], t["obj"], t.get("obj_lang"),
            t.get("obj_datatype"), bool(t.get("obj_is_uri")))


def main():
    from ferenda_spark.fixtures.webpages import BASE_URL  # noqa: F401
    from ferenda_spark.operators.extract import extract
    from ferenda_spark.operators.triples import all_triples
    from ferenda_spark.session import get_spark
    from ferenda_spark.turtle import commondata_rows_from_turtle, parse_turtle

    basefiles = sys.argv[1:] or golden_basefiles()
    spark = get_spark("rfc_parity", cores=8)
    spark.sparkContext.setLogLevel("ERROR")

    pages = spark.createDataFrame(
        load_pages(basefiles),
        "url string, warc_ts timestamp, html binary, text string, lang string")
    cd = spark.createDataFrame(
        [(r["uri"], r["label"], r["pred"])
         for r in commondata_rows_from_turtle(open(EXTRA).read())],
        "uri string, label string, pred string")
    got_rows = all_triples(extract(pages), cd).collect()

    tot_tp = tot_fp = tot_fn = 0
    for bf in basefiles:
        uri = f"http://localhost:8000/res/rfc/{bf}"
        got = {key(r.asDict()) for r in got_rows
               if r.url == uri or r.subj.startswith(uri)}
        want = {key(t) for t in parse_turtle(
            open(f"{REF}/distilled/{bf}.ttl").read())}
        tp, fp, fn = len(got & want), len(got - want), len(want - got)
        tot_tp += tp; tot_fp += fp; tot_fn += fn
        print(f"RFC {bf}: tp={tp} fp={fp} fn={fn} "
              f"P={tp/max(tp+fp,1):.3f} R={tp/max(tp+fn,1):.3f}")
        if fp or fn:
            for t in sorted(got - want)[:12]:
                print("   +", t)
            for t in sorted(want - got)[:12]:
                print("   -", t)
    p = tot_tp / max(tot_tp + tot_fp, 1)
    r = tot_tp / max(tot_tp + tot_fn, 1)
    print(f"TOTAL P={p:.4f} R={r:.4f} (tp={tot_tp} fp={tot_fp} fn={tot_fn})")
    spark.stop()


if __name__ == "__main__":
    main()
