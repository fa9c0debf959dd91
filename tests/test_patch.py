"""P13 patching operator (patch_if_needed semantics)."""

import pytest

from ferenda_spark.operators.patch import (PatchError, apply_patches,
                                           apply_unified_diff)

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
