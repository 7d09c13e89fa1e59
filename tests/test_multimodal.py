"""Multimodal plumbing tests: schema contract, Arrow batch shapes,
1:1 map and fan-out mapInPandas patterns, decode stub, deterministic
fake-feature parity with a pure-Python reference.
"""

from __future__ import annotations

import pytest

from pinterest_data_pipeline6_spark.operators import multimodal as M

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def media(spark):
    df = M.synthesize_media(spark, SF)
    df.cache().count()
    return df


def test_media_schema(media):
    assert [f.name for f in media.schema.fields] == ["media_id", "kind", "payload", "meta"]
    assert media.schema["payload"].dataType.typeName() == "binary"
    meta = media.schema["meta"].dataType
    assert [f.name for f in meta.fields] == ["width", "height", "sample_rate", "duration_ms"]


def test_extract_features_shape_and_values(spark, media):
    feats = M.extract_features(media)
    rows = {r["media_id"]: r for r in feats.collect()}
    src = {r["media_id"]: r for r in media.collect()}
    assert set(rows) == set(src)
    # every vector has the declared dim; values match the pure-Python reference
    for mid, r in list(rows.items())[:20]:
        assert len(r["features"]) == M.FEATURE_DIM
        expected = M._fake_features(bytes(src[mid]["payload"]))
        got = [round(float(v), 6) for v in r["features"]]
        assert got == pytest.approx(expected, abs=1e-6)


def test_sample_frames_fanout(spark, media):
    frames = M.sample_frames(media, every=2, frame_size=16)
    pdf = frames.toPandas()
    # only video rows fan out; frame indices step by `every`
    n_video = media.filter("kind = 'video'").count()
    assert pdf["media_id"].nunique() == n_video
    one = pdf[pdf["media_id"] == pdf["media_id"].iloc[0]].sort_values("frame_idx")
    assert list(one["frame_idx"])[:3] == [0, 2, 4][: len(one)]
    assert all(len(b) <= 16 for b in one["frame"])


def test_decode_stub_is_explicit():
    with pytest.raises(NotImplementedError, match="codec"):
        M._decode_image(b"\xff\xd8\xff")


def test_metadata_filter_prunes_before_decode(spark, media):
    """Catalyst metadata predicates select the decode subset — decode
    never sees filtered-out rows."""
    wide = media.filter(media.meta.width > 320)
    feats = M.extract_features(wide)
    assert feats.count() == wide.count()


def test_resize_payloads(spark, media):
    resized = M.resize_payloads(media, factor=4)
    out = {r["media_id"]: bytes(r["payload"]) for r in resized.collect()}
    src = {r["media_id"]: bytes(r["payload"]) for r in media.collect()}
    assert set(out) == set(src)
    for mid in list(out)[:20]:
        assert out[mid] == src[mid][::4]
