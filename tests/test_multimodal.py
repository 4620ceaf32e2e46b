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


def test_real_wav_decoder_end_to_end(spark):
    """REAL audio decode with zero optional deps, runs in THIS sandbox:
    genuine RIFF/WAVE PCM clips (Catalyst-generated and stdlib-written)
    go through the same mapInPandas plumbing; the parser must agree with
    the stdlib `wave` module byte-for-byte on the sample stream."""
    import io
    import struct
    import wave

    import numpy as np

    # Catalyst-generated clips: (a) stdlib wave opens them — genuine
    # containers, not fingerprints; (b) kernel strips == numpy decode
    gen = M.generate_wav_media(spark, 8)
    feats = {
        r.media_id: r
        for r in M.extract_features(gen, decoder="wav").collect()
    }
    for r in gen.collect():
        payload = bytes(r.payload)
        with wave.open(io.BytesIO(payload)) as w:
            assert (w.getnchannels(), w.getsampwidth(), w.getframerate()) == (
                1, 2, M.WAV_RATE,
            )
            assert w.getnframes() == M.WAV_SAMPLES
            pcm = w.readframes(M.WAV_SAMPLES)
        samples = np.frombuffer(pcm, dtype="<i2").astype(np.float64)
        want = [
            s.mean() / 32768.0 for s in np.array_split(samples, M.FEATURE_DIM)
        ]
        assert np.allclose(feats[r.media_id].features, want, atol=1e-7)
        # non-degenerate: an endianness or sign bug could not pass
        assert len(set(feats[r.media_id].features)) > 1

    # stdlib-WRITTEN wav (different writer than ours) decodes too,
    # stereo downmix included
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(2)
        w.setsampwidth(2)
        w.setframerate(8000)
        frames = struct.pack("<8h", 100, 300, -100, -300, 32767, -32768, 0, 0)
        w.writeframes(frames)
    f = M.wav_audio_features(buf.getvalue(), "audio")
    assert len(f) == M.FEATURE_DIM
    assert np.isclose(f[0], 200 / 32768.0, atol=1e-6)  # mean(100,300)
    assert np.isclose(f[1], -200 / 32768.0, atol=1e-6)

    # malformed input raises (it is a real parser)
    with pytest.raises(ValueError):
        M.wav_audio_features(b"OggS" + bytes(64), "audio")
    with pytest.raises(ValueError):  # non-PCM format code
        bad = bytearray(bytes(M.generate_wav_media(spark, 1).collect()[0].payload))
        bad[20] = 3  # fmt code: IEEE float
        M.wav_audio_features(bytes(bad), "audio")
    # non-audio kinds fall back to the deterministic fake
    fake = M.wav_audio_features(b"whatever", "image")
    assert len(fake) == M.FEATURE_DIM and all(0 <= x < 1 for x in fake)


def test_real_y4m_decoder_end_to_end(spark):
    """REAL video decode with zero optional deps: genuine YUV4MPEG2
    streams parse frame-by-frame; plane means must equal an independent
    numpy carve of the raw byte layout (header + FRAME markers)."""
    import numpy as np

    gen = M.generate_y4m_media(spark, 6)
    stats = {}
    for r in M.y4m_frame_stats(gen).collect():
        stats[(r.media_id, r.frame_idx)] = (r.y_mean, r.u_mean, r.v_mean)
    hdr = f"YUV4MPEG2 W{M.Y4M_W} H{M.Y4M_H} F25:1 Ip A1:1 C444\n".encode()
    plane = M.Y4M_W * M.Y4M_H
    for r in gen.collect():
        payload = bytes(r.payload)
        assert payload.startswith(hdr)
        o = len(hdr)
        for fi in range(M.Y4M_FRAMES):
            assert payload[o : o + 6] == b"FRAME\n"
            o += 6
            want = []
            for _ in range(3):
                want.append(
                    np.frombuffer(payload, np.uint8, plane, o).mean() / 255.0
                )
                o += plane
            assert np.allclose(stats[(r.media_id, fi)], want, atol=1e-6)
        assert o == len(payload)  # parser and layout agree on the full extent

    # C420 subsampled streams parse too (U/V planes quarter-size), and
    # per-frame params after FRAME are skipped per spec
    c420 = (
        b"YUV4MPEG2 W4 H4 C420jpeg\n"
        + b"FRAME Xparam\n"
        + bytes(range(16))      # Y
        + bytes([100] * 4)      # U
        + bytes([200] * 4)      # V
    )
    w, h, cs, frames = M._parse_y4m(c420)
    assert (w, h, cs) == (4, 4, "C420jpeg") and len(frames) == 1
    y, u, v = frames[0]
    assert y.mean() == np.mean(range(16)) and u.mean() == 100 and v.mean() == 200

    # malformed input raises (real parser): bad magic, truncated frame
    with pytest.raises(ValueError):
        M._parse_y4m(b"RIFF....")
    with pytest.raises(ValueError):
        M._parse_y4m(b"YUV4MPEG2 W8 H8 C444\nFRAME\n" + bytes(10))


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


def test_ppm_resize_halves_dims_and_picks_stride_grid(spark):
    """The resized sums must equal a numpy re-derivation from the raw
    payload, and dims must halve (16x16 -> 8x8)."""
    import numpy as np

    from mircv_project_spark.operators.multimodal import (
        generate_ppm_media,
        ppm_resize_stats,
    )

    media = generate_ppm_media(spark, 6)
    got = {
        r["media_id"]: (r["out_w"], r["out_h"], r["sum_r"], r["sum_g"], r["sum_b"])
        for r in ppm_resize_stats(media, factor=2).collect()
    }
    for r in media.collect():
        b = bytes(r["payload"])
        raster = np.frombuffer(b, dtype=np.uint8, count=16 * 16 * 3, offset=13).reshape(16, 16, 3)
        small = raster[::2, ::2, :].astype(np.int64)
        s = small.sum(axis=(0, 1))
        assert got[r["media_id"]] == (8, 8, int(s[0]), int(s[1]), int(s[2]))


def test_y4m_frame_sample_is_strided_subset(spark):
    """Sampled rows must be exactly the even-index subset of the full
    frame stats (identical means on shared frames)."""
    from mircv_project_spark.operators.multimodal import (
        generate_y4m_media,
        y4m_frame_sample,
        y4m_frame_stats,
    )

    media = generate_y4m_media(spark, 4)
    full = {
        (r["media_id"], r["frame_idx"]): (r["y_mean"], r["u_mean"], r["v_mean"])
        for r in y4m_frame_stats(media).collect()
    }
    sampled = {
        (r["media_id"], r["frame_idx"]): (r["y_mean"], r["u_mean"], r["v_mean"])
        for r in y4m_frame_sample(media, stride=2).collect()
    }
    assert sampled == {k: v for k, v in full.items() if k[1] % 2 == 0}
    assert sampled and len(sampled) < len(full)


def test_image_ahash_pairs_catches_planted_near_dups(spark):
    """Exact copies land at dist 0, localized-edit mutants land within
    the threshold, and unrelated random images never pair; the
    candidate join is a band equi-join (no nested loop)."""
    from mircv_project_spark import plans
    from mircv_project_spark.operators.multimodal import (
        AHASH_T,
        generate_ppm_media,
        generate_ppm_media_with_mutants,
        image_ahash_pairs,
        ppm_ahash_sig,
    )
    from mircv_project_spark.plans import checks

    media = generate_ppm_media_with_mutants(spark, 16, seed=42)
    df = image_ahash_pairs(media)
    checks.assert_no_broadcast_nested_loop(df)
    got = {(r.id_a, r.id_b): r.dist for r in df.collect()}
    # every pair is an (original, its mutant) pair — random images
    # never land within 7 bits of each other
    assert got
    assert all(b == a + 1000 for a, b in got)
    assert all(0 <= d <= AHASH_T for d in got.values())

    # kernel model check: signature of an exact byte copy is identical
    rows = generate_ppm_media(spark, 2, seed=7).collect()
    s0 = ppm_ahash_sig(bytes(rows[0].payload), "image")
    s0b = ppm_ahash_sig(bytes(rows[0].payload), "image")
    s1 = ppm_ahash_sig(bytes(rows[1].payload), "image")
    assert s0 == s0b and s0 != s1
    assert all(0 <= h < (1 << 32) for h in s0)


def test_audio_fingerprint_pairs_catches_planted_near_dups(spark):
    """Mutant clips land within the threshold (only the first frame's
    energy changes -> bit 0 at most), random clips never pair, and
    the candidate join is a band equi-join."""
    from mircv_project_spark.operators.multimodal import (
        AFP_T,
        audio_fingerprint_pairs,
        generate_wav_media,
        generate_wav_media_with_mutants,
        wav_fingerprint_sig,
    )
    from mircv_project_spark.plans import checks

    media = generate_wav_media_with_mutants(spark, 16, seed=42)
    df = audio_fingerprint_pairs(media)
    checks.assert_no_broadcast_nested_loop(df)
    got = {(r.id_a, r.id_b): r.dist for r in df.collect()}
    assert got
    assert all(b == a + 1000 for a, b in got)
    assert all(0 <= d <= AFP_T for d in got.values())
    # a chunk-0 edit can only flip the first delta bit
    assert all(d <= 1 for d in got.values())

    rows = generate_wav_media(spark, 2, seed=9).collect()
    s0 = wav_fingerprint_sig(bytes(rows[0].payload), "audio")
    s1 = wav_fingerprint_sig(bytes(rows[1].payload), "audio")
    assert s0 != s1 and 0 <= s0 < (1 << 31)


def test_video_fingerprint_pairs_catches_planted_near_dups(spark):
    """Frame-0 pixel-0 mutants land within the threshold (5 intact
    frames guarantee the frame-equality candidates fire), random
    videos never pair, and the candidate join is an equi-join."""
    from mircv_project_spark.operators.multimodal import (
        VFP_T,
        generate_y4m_media_with_mutants,
        video_fingerprint_pairs,
        y4m_frame_sigs,
    )
    from mircv_project_spark.plans import checks

    media = generate_y4m_media_with_mutants(spark, 8, seed=42)
    df = video_fingerprint_pairs(media)
    checks.assert_no_broadcast_nested_loop(df)
    got = {(r.id_a, r.id_b): r.dist for r in df.collect()}
    assert got
    assert all(b == a + 1000 for a, b in got)
    assert all(0 <= d <= VFP_T for d in got.values())

    # kernel: per-frame sigs are 6 frames of 32-bit halves
    rows = media.where("media_id = 0").collect()
    sigs = y4m_frame_sigs(bytes(rows[0].payload), "video")
    assert [f for f, _, _ in sigs] == list(range(6))
    assert all(0 <= hi < (1 << 32) and 0 <= lo < (1 << 32)
               for _, hi, lo in sigs)
