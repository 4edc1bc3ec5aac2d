"""Baseline JPEG codec: round-trip bounds, spec-structure checks, error
paths, and the Spark multimodal pipeline integration.

No libjpeg/PIL exists in the container to cross-validate against, so the
conformance argument is layered (see the ``jpeg_codec`` module docstring):
the DCT pair is verified as an inverse independently of the entropy coder,
round-trip error is bounded by the quantization step, and the emitted
marker structure is checked byte-level.  The DHT tables written to the
stream are the tables read back, so even a transcription slip in the
Annex-K constants could not corrupt a round trip.
"""

from __future__ import annotations

import numpy as np
import pytest

from spreadsheet_etl_engine_spark.functions import media_codecs as MC
from spreadsheet_etl_engine_spark.functions.jpeg_codec import (
    _DCT_M,
    QUANT_CHROMA,
    QUANT_LUMA,
    ZIGZAG,
    decode_jpeg,
    encode_jpeg,
    scaled_quant_tables,
)


def _smooth(h: int, w: int) -> np.ndarray:
    """A genuinely smooth RGB ramp (no mod-256 sawtooth wraps, which would
    legitimately ring at any quality below 100)."""
    y = np.linspace(40, 200, h)[:, None]
    x = np.linspace(30, 90, w)[None, :]
    return np.stack(
        [y + x * 0.3, 255 - (y * 0.5 + x * 0.2), y * 0.2 + x], axis=-1
    ).clip(0, 255).astype(np.uint8)


def test_dct_matrix_is_orthonormal():
    # Inverse property independent of the entropy coder: a shared zigzag
    # or Huffman mistake cancels in a round trip, an unorthonormal DCT
    # cannot.
    assert np.allclose(_DCT_M @ _DCT_M.T, np.eye(8), atol=1e-12)
    rng = np.random.default_rng(0)
    block = rng.uniform(-128, 127, (8, 8))
    freq = _DCT_M @ block @ _DCT_M.T
    assert np.allclose(_DCT_M.T @ freq @ _DCT_M, block, atol=1e-9)


def test_quality_scaling_is_identity_at_50():
    qy, qc = scaled_quant_tables(50)
    assert np.array_equal(qy, QUANT_LUMA)
    assert np.array_equal(qc, QUANT_CHROMA)
    qy100, _ = scaled_quant_tables(100)
    assert np.array_equal(qy100, np.ones(64, dtype=np.int64))
    with pytest.raises(ValueError, match="quality"):
        scaled_quant_tables(0)


def test_zigzag_is_a_permutation():
    assert sorted(ZIGZAG.tolist()) == list(range(64))
    # Spot-check the published corners: scan starts 0,1,8,16,9,2 and ends
    # at the bottom-right coefficient.
    assert ZIGZAG[:6].tolist() == [0, 1, 8, 16, 9, 2]
    assert ZIGZAG[63] == 63


@pytest.mark.parametrize(
    "quality,subsampling,tol",
    [(100, "444", 3), (95, "444", 6), (85, "420", 12), (50, "420", 24)],
)
def test_roundtrip_error_bounded_by_quant_step(quality, subsampling, tol):
    img = _smooth(24, 33)  # non-multiple-of-MCU on both axes
    dec = decode_jpeg(encode_jpeg(img, quality=quality, subsampling=subsampling))
    assert dec.shape == img.shape
    err = np.abs(dec.astype(int) - img.astype(int)).max()
    assert err <= tol, f"q{quality}/{subsampling}: max |err| {err} > {tol}"


def test_q100_is_near_exact_even_on_noise():
    rng = np.random.default_rng(7)
    noise = rng.integers(0, 256, (16, 16, 3), dtype=np.uint8)
    dec = decode_jpeg(encode_jpeg(noise, quality=100))
    assert np.abs(dec.astype(int) - noise.astype(int)).max() <= 3


def test_grayscale_single_component_roundtrip():
    rng = np.random.default_rng(3)
    g = rng.integers(0, 256, (17, 13), dtype=np.uint8)
    enc = encode_jpeg(g, quality=100)
    dec = decode_jpeg(enc)
    assert dec.shape == (17, 13, 1)
    assert np.abs(dec[:, :, 0].astype(int) - g.astype(int)).max() <= 2
    # (h, w, 1) input encodes identically to (h, w)
    assert encode_jpeg(g[:, :, None], quality=100) == enc


def test_420_is_lossless_for_constant_chroma():
    # R=G=B makes Cb=Cr exactly 128 (the BT.601 chroma rows sum to 0), so
    # 2x2 subsampling discards nothing and 4:2:0 matches 4:4:4's Y error.
    g = _smooth(20, 28)[:, :, :1]
    img = np.repeat(g, 3, axis=2)
    d420 = decode_jpeg(encode_jpeg(img, quality=100, subsampling="420"))
    assert np.abs(d420.astype(int) - img.astype(int)).max() <= 3


def test_restart_interval_roundtrip_and_marker():
    img = _smooth(24, 33)
    with_rst = encode_jpeg(img, quality=90, subsampling="420", restart_interval=2)
    without = encode_jpeg(img, quality=90, subsampling="420")
    assert b"\xff\xdd" in with_rst and b"\xff\xd0" in with_rst  # DRI + RST0
    assert b"\xff\xdd" not in without
    assert np.array_equal(decode_jpeg(with_rst), decode_jpeg(without))


def test_marker_structure():
    enc = encode_jpeg(_smooth(8, 8), quality=85)
    assert enc[:2] == b"\xff\xd8" and enc[-2:] == b"\xff\xd9"
    assert enc[2:4] == b"\xff\xe0" and enc[6:11] == b"JFIF\x00"
    assert b"\xff\xc0" in enc  # baseline SOF0, never SOF2
    assert b"\xff\xc2" not in enc
    # Deterministic: byte-identical on re-encode.
    assert encode_jpeg(_smooth(8, 8), quality=85) == enc


def test_error_paths():
    img = _smooth(16, 16)
    enc = encode_jpeg(img, quality=85)
    with pytest.raises(ValueError, match="not a JPEG"):
        decode_jpeg(b"\x00\x01\x02")
    # Flipping SOF0->SOF2 over a BASELINE scan makes an invalid hybrid
    # (the full-band Ss=0..Se=63 scan is illegal in a progressive
    # frame): fail loud, never decode garbage (r12 — SOF2 itself is
    # supported now, real progressive files decode).
    with pytest.raises(ValueError, match="progressive DC scan"):
        sof = enc.index(b"\xff\xc0")
        decode_jpeg(enc[:sof] + b"\xff\xc2" + enc[sof + 2:])
    with pytest.raises(ValueError, match="16-bit quant"):
        dqt = enc.index(b"\xff\xdb")
        bad = bytearray(enc)
        bad[dqt + 4] |= 0x10  # Pq nibble -> 16-bit
        decode_jpeg(bytes(bad))
    with pytest.raises(ValueError, match="truncated"):
        decode_jpeg(enc[:-40])  # cut inside the entropy stream
    with pytest.raises(ValueError, match="uint8"):
        encode_jpeg(img.astype(np.int32))
    with pytest.raises(ValueError, match="subsampling"):
        encode_jpeg(img, subsampling="422")
    with pytest.raises(ValueError, match="empty"):
        encode_jpeg(np.zeros((0, 4, 3), dtype=np.uint8))
    with pytest.raises(ValueError, match="restart_interval"):
        encode_jpeg(img, restart_interval=0)


def test_header_probes_agree_with_decoders():
    """probe_*_dims must report exactly what the full decoder would,
    reject exactly the variants it rejects, and never touch the entropy
    stream (a probe on an entropy-truncated stream still succeeds)."""
    img = _smooth(12, 18)
    for sub in ("444", "420"):
        enc = encode_jpeg(img, quality=85, subsampling=sub)
        assert MC.probe_jpeg_dims(enc) == (18, 12)
        # entropy stream truncated -> probe still fine, full decode raises
        assert MC.probe_jpeg_dims(enc[:-40]) == (18, 12)
        with pytest.raises(ValueError, match="truncated"):
            decode_jpeg(enc[:-40])
    enc = encode_jpeg(img)
    sof = enc.index(b"\xff\xc0")
    # SOF2 probes fine since r12 (progressive decode is real); the
    # never-supported SOF classes stay rejected by both entry points.
    assert MC.probe_jpeg_dims(enc[:sof] + b"\xff\xc2" + enc[sof + 2:]) \
        == (18, 12)
    with pytest.raises(ValueError, match="coding process"):
        MC.probe_jpeg_dims(enc[:sof] + b"\xff\xc3" + enc[sof + 2:])
    with pytest.raises(ValueError, match="not a JPEG"):
        MC.probe_jpeg_dims(b"nope")

    png = MC.encode_png(img)
    assert MC.probe_png_dims(png) == (18, 12)
    assert MC.probe_png_dims(png[:33]) == (18, 12)  # IDAT gone, IHDR enough
    bad = bytearray(png)
    bad[8 + 4 + 4 + 12] = 1  # interlace flag: Adam7 probes fine (r12)
    assert MC.probe_png_dims(bytes(bad)) == (18, 12)
    bad[8 + 4 + 4 + 12] = 2  # unknown interlace method stays rejected
    with pytest.raises(ValueError, match="interlace"):
        MC.probe_png_dims(bytes(bad))
    with pytest.raises(ValueError, match="IHDR"):
        MC.probe_png_dims(png[:20])


def test_fuzz_corrupt_streams_raise_valueerror_only():
    """Total error contract: any corruption raises ValueError (the class
    the Spark totality wrappers catch) — never OverflowError/IndexError/
    struct.error — and never a runaway allocation (a flipped SOF
    dimension byte must hit the entropy-length guard, not np.zeros)."""
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (16, 16, 3), dtype=np.uint8)
    enc = encode_jpeg(img, quality=85, subsampling="420", restart_interval=2)
    for _ in range(400):
        b = bytearray(enc)
        for _ in range(int(rng.integers(1, 4))):
            b[int(rng.integers(2, len(b)))] = int(rng.integers(0, 256))
        try:
            out = decode_jpeg(bytes(b))
            assert isinstance(out, np.ndarray)  # harmless flips may decode
        except ValueError:
            pass
    for _ in range(200):
        junk = b"\xff\xd8" + bytes(
            rng.integers(0, 256, int(rng.integers(0, 300)), dtype=np.uint8))
        try:
            decode_jpeg(junk)
        except ValueError:
            pass
        try:
            MC.probe_jpeg_dims(junk)
        except ValueError:
            pass


def test_sniff_detects_jpeg():
    enc = encode_jpeg(_smooth(8, 8))
    assert MC.sniff(enc) == "jpeg"
    assert MC.sniff(b"\xff\xd8\x00") == "unknown"  # SOI alone isn't enough


def test_property_q100_roundtrip_random_images():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=25, deadline=None)
    @given(
        h=st.integers(1, 20),
        w=st.integers(1, 20),
        seed=st.integers(0, 2**31),
        sub=st.sampled_from(["444", "420"]),
    )
    def check(h, w, seed, sub):
        rng = np.random.default_rng(seed)
        if sub == "444":
            img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        else:
            # 4:2:0 discards chroma detail by design, and on saturated
            # noise the resulting out-of-gamut RGB clips (shifting Y too)
            # — that is correct lossy behavior, not a bug, so the 4:2:0
            # property uses constant-chroma noise (R=G=B -> Cb=Cr=128,
            # nothing to discard, no clipping).
            img = np.repeat(
                rng.integers(0, 256, (h, w, 1), dtype=np.uint8), 3, axis=2)
        dec = decode_jpeg(encode_jpeg(img, quality=100, subsampling=sub))
        assert dec.shape == img.shape
        assert np.abs(dec.astype(int) - img.astype(int)).max() <= 3

    check()


def test_jpeg_through_spark_pipeline(spark):
    """JPEG rows decode/resize/feature-extract through the Arrow-batched
    operators exactly like the lossless containers."""
    from spreadsheet_etl_engine_spark.operators import multimodal as MM

    img = _smooth(12, 18)
    gray = _smooth(9, 7)[:, :, 0]
    rows = [
        (1, "image", encode_jpeg(img, quality=95), 0),
        (2, "image", encode_jpeg(img, quality=85, subsampling="420"), 0),
        (3, "image", encode_jpeg(gray, quality=90), 0),
        (4, "image", b"\xff\xd8\xff\xe0corrupt", 0),
    ]
    media = spark.createDataFrame(rows, MM.MEDIA_SCHEMA)

    got = {r["media_id"]: r for r in MM.decode_media(media).collect()}
    assert (got[1]["width"], got[1]["height"]) == (18, 12)
    assert (got[2]["width"], got[2]["height"]) == (18, 12)
    assert (got[3]["width"], got[3]["height"]) == (7, 9)
    assert (got[4]["width"], got[4]["height"]) == (0, 0)  # total, never raises

    resized = {r["media_id"]: bytes(r["data"])
               for r in MM.resize_images(media, width=6, height=4).collect()}
    for mid in (1, 2):
        out = decode_jpeg(resized[mid])
        assert out.shape == (4, 6, 3)
        # resized content ~= numpy nearest-neighbor of the decoded source
        expect = MC.resize_nearest(decode_jpeg(bytes(rows[mid - 1][2])), 6, 4)
        assert np.abs(out.astype(int) - expect.astype(int)).max() <= 16
    assert decode_jpeg(resized[3]).shape == (4, 6, 1)  # gray stays gray
    assert resized[4] == bytes(rows[3][2])  # corrupt bytes pass through

    feats = {r["media_id"]: r["feature"]
             for r in MM.extract_features(media).collect()}
    imgf = decode_jpeg(bytes(rows[0][2])).astype(np.float32) / 255.0
    assert np.allclose(feats[1][:3], imgf.mean(axis=(0, 1)), atol=1e-5)
    assert len(feats[4]) == MM.FEATURE_DIM  # md5 fallback embedding


def test_fill_bytes_before_markers_are_skipped():
    """T.81 B.1.1.2: any run of extra 0xFF may pad before a marker code.
    Some encoders emit them; decode and probe must skip them like
    libjpeg's next_marker does."""
    img = _smooth(10, 14)
    enc = encode_jpeg(img, quality=90)
    dqt = enc.index(b"\xff\xdb")
    sof = enc.index(b"\xff\xc0")
    padded = (enc[:dqt] + b"\xff\xff" + enc[dqt:sof]
              + b"\xff" + enc[sof:])
    assert MC.probe_jpeg_dims(padded) == (14, 10)
    assert np.array_equal(decode_jpeg(padded), decode_jpeg(enc))


def test_progressive_decodes_exactly_like_baseline():
    """r12: encode_jpeg_progressive carries the SAME quantized
    coefficients as encode_jpeg — only the entropy layer differs — so
    the progressive file's decoded pixels must equal the baseline
    file's EXACTLY (not approximately), across color/gray, both
    subsampling modes, qualities, and non-MCU-aligned sizes.  This
    pins the whole Annex-G surface: spectral selection bands,
    successive-approximation DC/AC refinement, EOB-run codes, and the
    per-scan optimal Huffman tables."""
    from spreadsheet_etl_engine_spark.functions.jpeg_codec import (
        encode_jpeg_progressive,
    )

    rng = np.random.default_rng(1217)
    cases = [((16, 16, 3), "444"), ((17, 23, 3), "420"), ((8, 8), "444"),
             ((30, 50, 3), "420"), ((1, 1, 3), "444"), ((9, 13), "444")]
    for shape, sub in cases:
        for q in (85, 100, 30):
            img = rng.integers(0, 256, shape, dtype=np.uint8)
            base = encode_jpeg(img, quality=q, subsampling=sub)
            prog = encode_jpeg_progressive(img, quality=q, subsampling=sub)
            assert prog != base
            assert np.array_equal(decode_jpeg(prog), decode_jpeg(base)), \
                (shape, sub, q)
            assert MC.probe_jpeg_dims(prog) == (shape[1], shape[0])

    # Smooth image: long EOB runs, including EOBn>1 codes that the
    # Annex-K typical tables cannot even express (the optimal per-scan
    # tables can).
    img = np.full((40, 40, 3), 128, np.uint8)
    img[5, 7] = [200, 10, 50]
    img[30, 20] = [0, 255, 0]
    base = encode_jpeg(img, quality=85, subsampling="420")
    prog = encode_jpeg_progressive(img, quality=85, subsampling="420")
    assert len(prog) < len(base)  # EOB runs beat per-block EOBs here
    assert np.array_equal(decode_jpeg(prog), decode_jpeg(base))


def test_progressive_restart_intervals():
    """Restart markers inside every progressive scan (DC and AC) reset
    the predictors and the EOB run; output must be byte-for-byte the
    same pixels as the unsegmented encode."""
    from spreadsheet_etl_engine_spark.functions.jpeg_codec import (
        encode_jpeg_progressive,
    )

    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, (33, 41, 3), dtype=np.uint8)
    want = decode_jpeg(encode_jpeg_progressive(img, quality=85,
                                               subsampling="420"))
    for ri in (1, 2, 5, 7):
        p = encode_jpeg_progressive(img, quality=85, subsampling="420",
                                    restart_interval=ri)
        assert b"\xff\xd0" in p or b"\xff\xd1" in p or ri > 6
        assert np.array_equal(decode_jpeg(p), want), ri


def test_progressive_fail_loud_gates():
    """Spec-order and corruption gates: a progressive stream whose
    first scan is not DC-first, AC scans claiming interleaving, and
    truncation all raise ValueError by name instead of mis-decoding."""
    from spreadsheet_etl_engine_spark.functions.jpeg_codec import (
        encode_jpeg_progressive,
    )

    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (16, 16, 3), dtype=np.uint8)
    prog = encode_jpeg_progressive(img, quality=85)

    # Truncate mid-way through the scans.
    with pytest.raises(ValueError):
        decode_jpeg(prog[: len(prog) // 2])

    # Flip the first SOS's Ss byte so the first scan claims to be AC:
    # the spec requires a DC first scan first (G.1.1.1.1).
    sos = prog.index(b"\xff\xda")
    ns = prog[sos + 4]
    ss_off = sos + 5 + 2 * ns
    bad = bytearray(prog)
    bad[ss_off] = 1
    bad[ss_off + 1] = 63
    with pytest.raises(ValueError, match="DC first|non-interleaved"):
        decode_jpeg(bytes(bad))

    # An AC refinement symbol with magnitude size > 1 is malformed.
    # (Constructed indirectly: corrupting entropy bytes must never
    # produce anything but ValueError — fuzz the scan bodies.)
    rng2 = np.random.default_rng(5)
    for _ in range(60):
        b = bytearray(prog)
        i = rng2.integers(sos + 10, len(prog) - 3)
        b[i] = int(rng2.integers(0, 256))
        try:
            out = decode_jpeg(bytes(b))
            assert out.shape == (16, 16, 3)  # decoded garbage is fine
        except ValueError:
            pass  # fail-loud is fine; anything else propagates and fails


def test_progressive_through_spark_pipeline(spark):
    """Progressive JPEG bytes flow through decode_media /
    extract_features / resize_images on the Arrow path: header probe
    dims, identical embedding to the baseline twin, real resize."""
    from spreadsheet_etl_engine_spark.functions.jpeg_codec import (
        encode_jpeg_progressive,
    )
    from spreadsheet_etl_engine_spark.operators import multimodal as MM

    img = _smooth(12, 18)
    rows = [
        (1, "image", encode_jpeg(img, quality=95), 0),
        (2, "image", encode_jpeg_progressive(img, quality=95), 0),
    ]
    media = spark.createDataFrame(rows, MM.MEDIA_SCHEMA)
    got = {r["media_id"]: r for r in MM.decode_media(media).collect()}
    assert (got[1]["width"], got[1]["height"]) == (18, 12)
    assert (got[2]["width"], got[2]["height"]) == (18, 12)
    feats = {r["media_id"]: r["feature"]
             for r in MM.extract_features(media).collect()}
    # Same pixels decoded from either container -> identical embedding.
    assert feats[1] == feats[2]
    resized = {r["media_id"]: bytes(r["data"])
               for r in MM.resize_images(media, width=6, height=4).collect()}
    assert decode_jpeg(resized[2]).shape == (4, 6, 3)


def test_optimal_huffman_tables_are_canonical_and_complete():
    """The K.2 builder: every emitted table must round-trip through the
    strict canonical constructor (prefix-feasible), cover exactly the
    requested symbols, reserve the all-ones code, and respect the
    16-bit cap even for degenerate frequency shapes."""
    from spreadsheet_etl_engine_spark.functions.jpeg_codec import (
        _canonical_codes,
        _optimal_huffman,
    )

    rng = np.random.default_rng(11)
    shapes = [
        {0: 1},                                   # single symbol
        {i: 1 for i in range(256)},               # uniform, max alphabet
        {i: 2 ** min(i, 40) for i in range(50)},  # wildly skewed
        {int(s): int(c) for s, c in
         zip(rng.integers(0, 256, 30), rng.integers(1, 1000, 30))},
    ]
    for freq in shapes:
        bits, vals = _optimal_huffman(freq)
        assert len(bits) == 16 and sum(bits) == len(vals)
        assert sorted(vals) == sorted(set(freq))
        codes = _canonical_codes(bits, vals)  # raises if infeasible
        # all-ones code of the longest used length stays reserved
        maxlen = max(length for _, length in codes.values())
        assert all(code != (1 << length) - 1 or length < maxlen
                   for code, length in codes.values())
