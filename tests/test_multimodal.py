"""Multimodal plumbing gates: the decode is stubbed (no media libs in
this container) but the Spark-side contract — schemas, 1->N fan-out
batch shape, byte-budget rechunking, determinism — is real and pinned
here (these are the rows-only registry entries' determinism gate)."""

import pandas as pd

from ferenda_spark import queries as Q
from ferenda_spark.operators.multimodal import (rechunk_by_bytes,
                                                sample_frames,
                                                synth_media_df)

SF = "/root/testdata/sf0.001"


def test_frame_sample_fans_out_and_is_deterministic(spark):
    media = synth_media_df(spark, 60)
    f1 = sample_frames(media, fps=1.0, max_frames=16).toPandas()
    f2 = sample_frames(media, fps=1.0, max_frames=16).toPandas()
    # only video rows fan out; every video yields 1..16 frames
    n_videos = media.where("kind = 'video'").count()
    per = f1.groupby("media_id").size()
    assert len(per) == n_videos
    assert per.between(1, 16).all()
    assert len(f1) > n_videos  # genuine 1->N fan-out
    key = ["media_id", "frame_idx"]
    assert f1.sort_values(key).reset_index(drop=True).equals(
        f2.sort_values(key).reset_index(drop=True))
    # frame timestamps follow the fps grid
    assert (f1["ts_s"] == f1["frame_idx"] / 1.0).all()


def test_frame_sample_respects_max_frames(spark):
    media = synth_media_df(spark, 60)
    f = sample_frames(media, fps=2.0, max_frames=4).toPandas()
    assert f.groupby("media_id").size().max() <= 4


def test_rechunk_by_bytes_bounds_chunks():
    pdf = pd.DataFrame({
        "media_id": range(10),
        "payload": [b"x" * (100 * (i + 1)) for i in range(10)],
    })
    chunks = list(rechunk_by_bytes(iter([pdf]), target_bytes=600))
    # nothing lost or reordered
    merged = pd.concat(chunks, ignore_index=True)
    assert merged["media_id"].tolist() == list(range(10))
    for c in chunks:
        sizes = c["payload"].map(len)
        # each chunk within budget unless it is a single over-budget row
        assert sizes.sum() <= 600 or len(c) == 1


def test_resize_preserves_aspect_and_never_upscales(spark):
    from ferenda_spark.operators.multimodal import resize_images
    media = synth_media_df(spark, 60)
    # max_side 16: the real PNG fixture dims are 8..30, so both the
    # downscale branch and the keep-small branch are exercised
    r = resize_images(media, max_side=16).toPandas()
    assert len(r) == media.where("kind = 'image'").count()
    assert (r[["new_w", "new_h"]].max(axis=1) <= 16).all()
    # no upscaling: already-small images keep their dims
    small = r[(r.orig_w <= 16) & (r.orig_h <= 16)]
    assert (small.new_w == small.orig_w).all()
    assert (small.new_h == small.orig_h).all()
    # aspect preserved within rounding
    big = r[(r.orig_w > 16) | (r.orig_h > 16)]
    assert len(big) > 0 and len(small) > 0
    ratio_err = (big.new_w / big.new_h - big.orig_w / big.orig_h).abs()
    assert (ratio_err < 0.12).all()
    r2 = resize_images(media, max_side=16).toPandas()
    assert r.sort_values("media_id").reset_index(drop=True).equals(
        r2.sort_values("media_id").reset_index(drop=True))


def test_resize_quarantines_malformed_payloads(spark):
    """Code-review regression: a truncated/undecodable image payload
    must yield a null-dims quarantine row, not fail the Spark job
    (the real decoders raise where the old stub could not)."""
    from ferenda_spark.operators.mediacodecs import PNG_SIG, encode_png
    from ferenda_spark.operators.multimodal import (MEDIA_SCHEMA,
                                                    resize_images)
    rows = [
        (1, "image", PNG_SIG + b"garbage", "image/png", {}),
        (2, "image", b"BMshort", "image/bmp", {}),
        (3, "image", encode_png(4, 4, bytes(48)), "image/png", {}),
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    got = {r.media_id: r for r in resize_images(media, 16).collect()}
    assert len(got) == 3
    assert got[1].orig_w is None and got[1].resized_sha1 is None
    assert got[2].orig_w is None
    assert got[3].orig_w == 4 and got[3].new_w == 4


def test_bmp_truncation_raises():
    """Code-review regression: a short BMP must raise (quarantine),
    not silently return a shrunken pixel buffer."""
    import pytest as _pytest

    from ferenda_spark.operators.mediacodecs import decode_bmp, encode_bmp
    data = encode_bmp(6, 5, bytes(90))
    with _pytest.raises(ValueError):
        decode_bmp(data[:-20])


def test_registry_query_runs_with_stable_schema(spark):
    df = Q.q_multimodal_frame_sample(spark, SF)
    assert df.columns == ["media_id", "frame_idx", "ts_s", "frame_sha1",
                          "frame_feature_md5"]
    assert df.count() > 0
