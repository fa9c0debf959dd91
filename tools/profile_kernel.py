"""Per-phase profiling of the kg extract kernel (VERDICT r03 #5).

The kg_pipeline wall is ~91% inside the Arrow-batched Python kernel
(operators/extract.extract_one); this tool times each phase over the
real fixture corpus WITHOUT Spark (pure kernel, same code path the
executors run) and prints a phase table + cProfile top list.

Usage: python tools/profile_kernel.py [n_pages] [--cprofile]
"""

import sys
import time
from collections import defaultdict

sys.path.insert(0, ".")

from ferenda_spark import htmlparse as hp           # noqa: E402
from ferenda_spark.fixtures.webpages import gen_rows   # noqa: E402
from ferenda_spark.operators import extract as E    # noqa: E402

TIMES: dict[str, float] = defaultdict(float)
CALLS: dict[str, int] = defaultdict(int)


def _wrap(holder, name, key):
    fn = getattr(holder, name)

    def wrapped(*a, **k):
        t0 = time.perf_counter()
        try:
            return fn(*a, **k)
        finally:
            TIMES[key] += time.perf_counter() - t0
            CALLS[key] += 1

    setattr(holder, name, wrapped)
    return fn


def instrument():
    # html phases (htmlparse module, called via hp.* inside extract_one)
    for name in ("decode_html", "parse_html", "content_select",
                 "clean_tree", "as_plaintext", "blocks", "doc_lang",
                 "doc_title", "head_meta"):
        _wrap(hp, name, f"html.{name}")
    # structure + citations (resolved through extract's module globals)
    for name in ("parse_rfc_text", "parse_rfc_header", "w3c_structure",
                 "find_citations"):
        if hasattr(E, name):
            _wrap(E, name, f"struct.{name}")
    from ferenda_spark.operators import sfs as S
    _wrap(S, "find_sfs_refs", "cite.find_sfs_refs")
    from ferenda_spark.operators import svlegal as SV
    for name in ("find_avg_refs", "find_forarbete_refs",
                 "find_rattsfall_refs"):
        _wrap(SV, name, f"cite.{name}")


def run(n):
    rows = gen_rows(n)
    t0 = time.perf_counter()
    for r in rows:
        E.extract_one(r["url"], r["html"])
    return time.perf_counter() - t0


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 480
    if "--cprofile" in sys.argv:
        import cProfile
        import pstats
        rows = gen_rows(n)
        pr = cProfile.Profile()
        pr.enable()
        for r in rows:
            E.extract_one(r["url"], r["html"])
        pr.disable()
        pstats.Stats(pr).sort_stats("cumulative").print_stats(25)
        return
    run(min(n, 60))                      # warm (regex caches, imports)
    global TIMES, CALLS
    TIMES, CALLS = defaultdict(float), defaultdict(int)
    instrument()
    wall = run(n)
    print(f"\n{n} pages, kernel wall {wall:.3f}s "
          f"({n / wall:.0f} docs/s single-core)\n")
    print(f"{'phase':34s} {'sec':>8s} {'%':>6s} {'calls':>7s}")
    for k in sorted(TIMES, key=TIMES.get, reverse=True):
        print(f"{k:34s} {TIMES[k]:8.3f} {100 * TIMES[k] / wall:5.1f}% "
              f"{CALLS[k]:7d}")
    print("\n(shares overlap where phases nest, e.g. as_plaintext "
          "inside w3c_structure — read as attribution, not a sum)")


if __name__ == "__main__":
    main()
