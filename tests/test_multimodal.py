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


def test_real_decoder_gated(spark):
    media = M.generate_media(spark, 3)
    with pytest.raises(NotImplementedError):
        M.extract_features(media, decoder="real")


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
