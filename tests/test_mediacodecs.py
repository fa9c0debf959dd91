"""From-scratch media codec gates (operators/mediacodecs.py): real
PNG/BMP/WAV bytes round-trip encode -> decode with exact dims,
pixels, and duration — including PNG scanline filters 1-4, which the
encoder never emits (hand-filtered fixtures below exercise them)."""

import struct
import zlib

import pytest

from ferenda_spark.operators import mediacodecs as MC
from ferenda_spark.operators.multimodal import decode_audio, decode_image


def _pixels(w, h, ch=3):
    return bytes((x * 7 + 3) % 256 for x in range(w * h * ch))


def test_png_roundtrip_rgb():
    for w, h in [(1, 1), (8, 19), (30, 26), (5, 1)]:
        px = _pixels(w, h)
        got_w, got_h, got_px, ch = MC.decode_png(MC.encode_png(w, h, px))
        assert (got_w, got_h, ch) == (w, h, 3)
        assert got_px == px


def test_png_roundtrip_gray_and_rgba():
    w, h = 9, 7
    for ch in (1, 2, 4):
        px = _pixels(w, h, ch)
        got_w, got_h, got_px, got_ch = MC.decode_png(
            MC.encode_png(w, h, px, channels=ch))
        assert (got_w, got_h, got_ch) == (w, h, ch)
        assert got_px == px


def _png_with_filters(w, h, px, ftypes):
    """Hand-build a PNG whose rows use the given filter types — the
    encoder always emits filter 0, so filters 1-4 need this."""
    ch, stride = 3, w * 3
    raw = bytearray()
    prev = bytes(stride)
    for y, ft in zip(range(h), ftypes):
        line = bytearray(px[y * stride:(y + 1) * stride])
        enc = bytearray(line)
        if ft == 1:
            for i in range(stride - 1, ch - 1, -1):
                enc[i] = (line[i] - line[i - ch]) & 0xFF
        elif ft == 2:
            for i in range(stride):
                enc[i] = (line[i] - prev[i]) & 0xFF
        elif ft == 3:
            for i in range(stride):
                left = line[i - ch] if i >= ch else 0
                enc[i] = (line[i] - ((left + prev[i]) >> 1)) & 0xFF
        elif ft == 4:
            for i in range(stride):
                left = line[i - ch] if i >= ch else 0
                ul = prev[i - ch] if i >= ch else 0
                enc[i] = (line[i] - MC._paeth(left, prev[i], ul)) & 0xFF
        raw += bytes([ft]) + bytes(enc)
        prev = bytes(line)
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (MC.PNG_SIG + MC._chunk(b"IHDR", ihdr)
            + MC._chunk(b"IDAT", zlib.compress(bytes(raw)))
            + MC._chunk(b"IEND", b""))


def test_png_all_filter_types_unfilter_exactly():
    w, h = 11, 5
    px = _pixels(w, h)
    data = _png_with_filters(w, h, px, ftypes=[0, 1, 2, 3, 4])
    got_w, got_h, got_px, _ = MC.decode_png(data)
    assert (got_w, got_h) == (w, h)
    assert got_px == px


def test_png_rejects_unsupported():
    with pytest.raises(ValueError):
        MC.decode_png(b"JUNK")
    # 16-bit depth
    ihdr = struct.pack(">IIBBBBB", 2, 2, 16, 2, 0, 0, 0)
    bad = MC.PNG_SIG + MC._chunk(b"IHDR", ihdr) + MC._chunk(b"IEND", b"")
    with pytest.raises(ValueError):
        MC.decode_png(bad)


def test_bmp_roundtrip():
    for w, h in [(1, 1), (7, 3), (10, 4)]:   # incl. stride-padding widths
        px = _pixels(w, h)
        got_w, got_h, got_px, ch = MC.decode_bmp(MC.encode_bmp(w, h, px))
        assert (got_w, got_h, ch) == (w, h, 3)
        assert got_px == px


def test_wav_roundtrip_duration_exact():
    pcm = struct.pack("<4000h", *((k * 13) % 2003 - 1001
                                  for k in range(4000)))
    data = MC.encode_wav(pcm, rate=8000)
    dur, rate, chans, bits, got = MC.decode_wav(data)
    assert (rate, chans, bits) == (8000, 1, 16)
    assert got == pcm
    assert dur == 4000 / 8000


def test_decode_image_real_path_dims_and_feature():
    """decode_image must report the REAL dims from the bytes (not the
    old payload-hash fake) and a pixel-derived feature."""
    w, h = 21, 13
    px = _pixels(w, h)
    got_w, got_h, feat = decode_image(MC.encode_png(w, h, px))
    assert (got_w, got_h) == (w, h)
    assert len(feat) == 8 and all(0.0 <= f <= 1.0 for f in feat)
    # constant-color image -> every grid cell mean equals that color
    flat = decode_image(MC.encode_png(4, 4, bytes([100] * 48)))[2]
    assert all(abs(f - 100 / 255) < 1e-6 for f in flat)


def test_decode_audio_real_path():
    pcm = struct.pack("<8000h", *([0] * 4000 + [1000] * 4000))
    dur, feat = decode_audio(MC.encode_wav(pcm, rate=8000))
    assert dur == 1.0
    assert len(feat) == 8
    # silence windows ~0, loud windows ~1000/32768
    assert all(f == 0.0 for f in feat[:4])
    assert all(abs(f - 1000 / 32768) < 1e-4 for f in feat[4:])
