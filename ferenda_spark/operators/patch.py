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

import difflib
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


def make_unified_diff(original: str, corrected: str,
                      description: str = "") -> str | None:
    """Patch CREATION (mkpatch): the inverse of ``apply_unified_diff``.

    Reference ``Devel.mkpatch`` (/root/reference/ferenda/devel.py:197-297)
    stashes the hand-edited file, regenerates the pristine one, and
    diffs pristine -> edited with ``difflib.unified_diff``; a
    single-line description is spliced onto the FIRST hunk's ``@@``
    control line (devel.py:276-281).  Same observable contract here:
    ``apply_unified_diff(original, make_unified_diff(original, c)) == c``.

    Returns None when the texts are identical (the reference refuses to
    write an empty patch — devel.py:296 "patch would be empty")."""
    if original == corrected:
        return None
    lines = list(difflib.unified_diff(
        original.split("\n"), corrected.split("\n"),
        fromfile="a", tofile="b", lineterm=""))
    if description and "\n" not in description:
        for i, ln in enumerate(lines):
            if ln.startswith("@@") and ln.endswith("@@"):
                lines[i] = ln + " " + description
                break
    return "\n".join(lines)


def make_patches(original: DataFrame, corrected: DataFrame,
                 key: str = "url", col: str = "text",
                 description: str = "") -> DataFrame:
    """(key, col) x (key, col) -> (key, diff) unified-diff patch table.

    Scale shape: corrected documents are hand-edited fixes, so the
    corrected side is tiny => broadcast INNER join against the full
    corpus (only rows with a correction ever reach Python), then an
    Arrow-batched per-row difflib.  No shuffle of the big side.
    Identical texts yield no row (reference skips empty patches)."""
    pairs = original.select(key, F.col(col).alias("_orig")).join(
        F.broadcast(corrected.select(key, F.col(col).alias("_corr"))), key)

    key_type = dict(original.dtypes)[key]
    schema = f"{key} {key_type}, diff string"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            diffs = [make_unified_diff(o if o is not None else "",
                                       c if c is not None else "",
                                       description)
                     for o, c in zip(pdf["_orig"], pdf["_corr"])]
            out = pd.DataFrame({key: pdf[key], "diff": diffs})
            yield out[out["diff"].notna()]

    return pairs.mapInPandas(run, schema)


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
