"""P13 patching operator (patch_if_needed semantics) + patch CREATION
(Devel.mkpatch semantics, reference devel.py:197-297)."""

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from ferenda_spark.operators.patch import (PatchError, apply_patches,
                                           apply_unified_diff,
                                           make_patches,
                                           make_unified_diff)

DOC = "line one\nline twoo\nline three\nline four"
DIFF = """--- a/doc
+++ b/doc
@@ -1,4 +1,4 @@
 line one
-line twoo
+line two
 line three
 line four
"""


def test_apply_unified_diff():
    assert apply_unified_diff(DOC, DIFF) == \
        "line one\nline two\nline three\nline four"


def test_context_mismatch_raises():
    with pytest.raises(PatchError):
        apply_unified_diff(DOC.replace("one", "uno"), DIFF)


def test_make_unified_diff_roundtrip():
    corrected = DOC.replace("twoo", "two").replace("four", "4")
    diff = make_unified_diff(DOC, corrected)
    assert apply_unified_diff(DOC, diff) == corrected


def test_make_unified_diff_empty_is_none():
    # reference refuses to write an empty patch (devel.py:296)
    assert make_unified_diff(DOC, DOC) is None


def test_make_unified_diff_description_on_first_hunk():
    # single-line description goes on the FIRST hunk's @@ line
    # (devel.py:276-281); the applier must still accept it
    corrected = DOC.replace("twoo", "two") + "\nline five"
    diff = make_unified_diff(DOC, corrected, "fix typo")
    hunks = [ln for ln in diff.split("\n") if ln.startswith("@@")]
    assert hunks[0].endswith("@@ fix typo")
    assert all(not h.endswith("fix typo") for h in hunks[1:])
    assert apply_unified_diff(DOC, diff) == corrected


@settings(max_examples=200, deadline=None)
@given(st.lists(st.sampled_from(["a", "bb", "c c", ""]), max_size=12),
       st.lists(st.sampled_from(["a", "bb", "c c", "", "d"]), max_size=12))
def test_make_apply_property(orig_lines, corr_lines):
    orig, corr = "\n".join(orig_lines), "\n".join(corr_lines)
    diff = make_unified_diff(orig, corr, "prop")
    assert apply_unified_diff(orig, diff or "") == corr


def test_make_patches_dataframe(spark):
    docs = spark.createDataFrame(
        [(1, DOC), (2, "same"), (3, "x\ny")], "doc_id long, text string")
    corrected = spark.createDataFrame(
        [(1, DOC.replace("twoo", "two")), (2, "same"), (3, "x\nz")],
        "doc_id long, text string")
    patches = {r.doc_id: r.diff for r in
               make_patches(docs, corrected, key="doc_id",
                            description="d").collect()}
    assert set(patches) == {1, 3}  # doc 2 unchanged: no empty patch
    assert apply_unified_diff(DOC, patches[1]) == DOC.replace("twoo", "two")
    assert apply_unified_diff("x\ny", patches[3]) == "x\nz"


def test_apply_patches_dataframe(spark):
    pages = spark.createDataFrame(
        [("u1", None, DOC.encode(), None, None),
         ("u2", None, b"untouched", None, None)],
        "url string, warc_ts timestamp, html binary, text string, lang string")
    patches = spark.createDataFrame([("u1", DIFF)], "url string, diff string")
    rows = {r.url: r for r in apply_patches(pages, patches).collect()}
    assert rows["u1"].patched and b"line two\n" in bytes(rows["u1"].html)
    assert not rows["u2"].patched and bytes(rows["u2"].html) == b"untouched"
    assert rows["u1"].patch_error is None

    # failing patch: original kept, error recorded (quarantine semantics)
    bad = spark.createDataFrame([("u2", DIFF)], "url string, diff string")
    rows2 = {r.url: r for r in apply_patches(pages, bad).collect()}
    assert not rows2["u2"].patched and rows2["u2"].patch_error
    assert bytes(rows2["u2"].html) == b"untouched"
