"""P13 patching: apply unified-diff patches to downloaded content
before parse (reference ``patch_if_needed``,
/root/reference/ferenda/documentrepository.py:1257-1298 — patches live
in a patchdir keyed by basefile; here they are a ``patches(url, diff)``
table).

Spark shape: patches are rare (hand-maintained fixes for broken
upstream documents), so the patch table is tiny => LEFT broadcast join,
and the diff application runs inside the Arrow batch only for rows that
actually have a patch.  Unpatched rows pass through untouched.
"""

from __future__ import annotations

import re
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_HUNK_RE = re.compile(r"^@@ -(\d+)(?:,(\d+))? \+(\d+)(?:,(\d+))? @@")


class PatchError(ValueError):
    pass


def apply_unified_diff(text: str, diff: str) -> str:
    """Minimal unified-diff applier (the reference shells out to
    python-patch; same observable result for well-formed diffs).
    Context lines are VERIFIED — a mismatch raises PatchError, matching
    the reference's behavior of failing the patch, not corrupting the
    document."""
    src = text.split("\n")
    out: list[str] = []
    pos = 0  # index into src
    lines = diff.split("\n")
    i = 0
    while i < len(lines):
        line = lines[i]
        m = _HUNK_RE.match(line)
        if not m:
            i += 1
            continue
        start = int(m.group(1)) - 1
        if start < pos:
            raise PatchError("overlapping or out-of-order hunks")
        out.extend(src[pos:start])
        pos = start
        i += 1
        while i < len(lines):
            h = lines[i]
            if h.startswith("@@"):
                break
            if h.startswith(" "):
                if pos >= len(src) or src[pos] != h[1:]:
                    raise PatchError(f"context mismatch at line {pos + 1}")
                out.append(src[pos])
                pos += 1
            elif h.startswith("-"):
                if pos >= len(src) or src[pos] != h[1:]:
                    raise PatchError(f"delete mismatch at line {pos + 1}")
                pos += 1
            elif h.startswith("+"):
                out.append(h[1:])
            elif h == "" or h.startswith("\\"):
                pass  # trailing blank / "\ No newline" marker
            else:
                break
            i += 1
    out.extend(src[pos:])
    return "\n".join(out)


PATCHED_COLS = ["url", "warc_ts", "html", "text", "lang",
                "patched", "patch_error"]


def apply_patches(web_pages: DataFrame, patches: DataFrame) -> DataFrame:
    """web_pages + patches(url, diff) -> web_pages with patched html and
    (patched, patch_error) lineage columns.  Broadcast left join; the
    Python diff application touches ONLY rows with a patch."""
    joined = web_pages.join(
        F.broadcast(patches.select("url", "diff")), "url", "left")

    schema = ("url string, warc_ts timestamp, html binary, text string, "
              "lang string, patched boolean, patch_error string")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            patched_flags, errors, htmls = [], [], []
            for html, diff in zip(pdf["html"], pdf["diff"]):
                if diff is None or pd.isna(diff):
                    htmls.append(html)
                    patched_flags.append(False)
                    errors.append(None)
                    continue
                try:
                    data = bytes(html) if html is not None else b""
                    htmls.append(
                        apply_unified_diff(
                            data.decode("utf-8", "replace"), diff)
                        .encode("utf-8"))
                    patched_flags.append(True)
                    errors.append(None)
                except PatchError as e:
                    htmls.append(html)  # keep the original, flag the row
                    patched_flags.append(False)
                    errors.append(str(e))
            out = pdf.drop(columns=["diff"]).copy()
            out["html"] = htmls
            out["patched"] = patched_flags
            out["patch_error"] = errors
            yield out[PATCHED_COLS]

    return joined.mapInPandas(run, schema)
