"""Multimodal plumbing: schema, Arrow batching, determinism of the
stubbed decode kernels (real codecs absent in this container by design —
operators/multimodal.py module docstring)."""

import pytest

from mircv_project_spark.operators import multimodal as M


def test_generate_media_deterministic(spark):
    a = M.generate_media(spark, 30).orderBy("media_id").collect()
    b = M.generate_media(spark, 30).orderBy("media_id").collect()
    assert [(r.media_id, r.kind, bytes(r.payload)) for r in a] == [
        (r.media_id, r.kind, bytes(r.payload)) for r in b
    ]
    sizes = {r.kind: len(r.payload) for r in a}
    assert sizes == {"image": 4096, "audio": 16384, "video": 65536}
    assert a[0].meta["codec"] == "fake/deterministic"


def test_extract_features_schema_and_determinism(spark):
    media = M.generate_media(spark, 30)
    out = M.extract_features(media)
    assert out.schema.simpleString() == (
        "struct<media_id:bigint,kind:string,n_bytes:bigint,"
        "features:array<float>>"
    )
    rows = {r.media_id: r for r in out.collect()}
    assert len(rows) == 30
    for r in rows.values():
        assert len(r.features) == M.FEATURE_DIM
        assert all(0.0 <= f < 1.0 for f in r.features)
    rows2 = {r.media_id: r for r in M.extract_features(media).collect()}
    assert all(rows[m].features == rows2[m].features for m in rows)


def _pil_available() -> bool:
    try:
        import PIL  # noqa: F401

        return True
    except ImportError:
        return False


@pytest.mark.skipif(_pil_available(), reason="PIL present: real path active")
def test_real_decoder_gated(spark):
    media = M.generate_media(spark, 3)
    with pytest.raises(NotImplementedError):
        M.extract_features(media, decoder="real")


def test_custom_callable_decoder(spark):
    """The pluggable kernel path: any callable(bytes, kind) -> ndarray
    swaps in unchanged — this is how a real embed model rides the same
    Arrow plumbing."""
    import numpy as np

    def kernel(payload: bytes, kind: str) -> np.ndarray:
        return np.full(M.FEATURE_DIM, float(len(payload) % 7), dtype=np.float32)

    media = M.generate_media(spark, 9)
    rows = {r.media_id: r for r in M.extract_features(media, decoder=kernel).collect()}
    assert len(rows) == 9
    for r in rows.values():
        assert r.features == [float(r.n_bytes % 7)] * M.FEATURE_DIM


def test_real_ppm_decoder_end_to_end(spark):
    """REAL image decode with zero optional deps, runs in THIS sandbox:
    genuine binary-PPM images (Catalyst-generated and hand-built) go
    through the same mapInPandas plumbing; features must equal the
    independently computed pixel strip means."""
    import numpy as np

    # hand-built constant-color P6 images: strips of color c -> c/255
    rows = []
    for i in range(4):
        c = 16 * i + 3
        payload = b"P6\n16 16\n255\n" + bytes([c, c, c] * (16 * 16))
        rows.append((i, "image", bytearray(payload), {"codec": "ppm"}))
    media = spark.createDataFrame(rows, M.MEDIA_SCHEMA)
    out = {r.media_id: r for r in M.extract_features(media, decoder="ppm").collect()}
    assert len(out) == 4
    for i in range(4):
        assert np.allclose(out[i].features, (16 * i + 3) / 255.0, atol=1e-6)

    # Catalyst-generated PPMs: parser output == independent numpy decode
    gen = M.generate_ppm_media(spark, 8)
    feats = {r.media_id: r for r in M.extract_features(gen, decoder="ppm").collect()}
    for r in gen.collect():
        payload = bytes(r.payload)
        hdr = len(b"P6\n16 16\n255\n")  # 13 bytes
        assert payload[:2] == b"P6" and len(payload) == hdr + 16 * 16 * 3
        raster = np.frombuffer(payload[hdr:], dtype=np.uint8)
        gray = raster.reshape(16, 16, 3).astype(np.float64).mean(axis=2)
        want = [s.mean() / 255 for s in np.array_split(gray, M.FEATURE_DIM, axis=0)]
        assert np.allclose(feats[r.media_id].features, want, atol=1e-6)
        # non-degenerate raster: strips must actually differ, so an
        # axis/order/off-by-one decode bug could not pass this test
        assert len(set(feats[r.media_id].features)) > 1
    # comments + non-square headers parse too
    odd = b"P6\n# a comment\n4 2\n255\n" + bytes(range(24))
    f = M.ppm_image_features(odd, "image")
    assert len(f) == M.FEATURE_DIM
    # malformed input raises (it is a real parser)
    with pytest.raises(ValueError):
        M.ppm_image_features(b"GIF89a....", "image")
    # 2-byte-sample PPMs (maxval > 255) are rejected, not misdecoded
    with pytest.raises(ValueError):
        M.ppm_image_features(b"P6\n2 2\n65535\n" + bytes(24), "image")


def test_real_image_decoder_with_pil(spark):
    """End-to-end REAL image decode — runs wherever PIL is importable
    (skips in containers without it): a genuine PNG goes through the
    same mapInPandas plumbing and yields pixel-derived features."""
    PIL = pytest.importorskip("PIL")  # noqa: F841
    import io

    import numpy as np
    from PIL import Image

    rows = []
    for i in range(4):
        img = Image.new("L", (16, 16), color=16 * i + 3)
        buf = io.BytesIO()
        img.save(buf, format="PNG")
        rows.append((i, "image", bytearray(buf.getvalue()), {"codec": "png"}))
    media = spark.createDataFrame(rows, M.MEDIA_SCHEMA)
    out = {r.media_id: r for r in M.extract_features(media, decoder="real").collect()}
    assert len(out) == 4
    for i in range(4):
        want = M.pil_image_features(bytes(rows[i][2]), "image")
        assert np.allclose(out[i].features, want)
        # constant-color image -> constant features == color/255
        assert np.allclose(out[i].features, (16 * i + 3) / 255.0, atol=1e-6)


def test_sample_frames(spark):
    media = M.generate_media(spark, 30)
    frames = M.sample_frames(media, every_n_bytes=16384)
    rows = frames.collect()
    # only video rows (65536 bytes -> 4 frames each)
    assert {r.media_id % 3 for r in rows} == {2}
    per = {}
    for r in rows:
        per.setdefault(r.media_id, []).append(r.frame_idx)
    assert all(sorted(v) == [0, 1, 2, 3] for v in per.values())
