"""Multimodal plumbing: schema, determinism, stub boundaries."""

import pytest
from pyspark.sql import functions as F

from hipporag_spark import multimodal as mm


@pytest.fixture(scope="module")
def media(spark):
    return mm.attach_media(spark, n=30).persist()


def test_media_schema_and_metadata(media):
    rows = media.collect()
    assert len(rows) == 30
    for r in rows:
        assert r["kind"] in ("image", "audio", "video")
        assert isinstance(r["payload"], (bytes, bytearray)) and len(r["payload"]) == 512
        m = r["meta"]
        if r["kind"] == "audio":
            assert m["sample_rate"] == 16000 and m["width"] == 0
        if r["kind"] == "video":
            assert m["n_frames"] >= 8
        if r["kind"] == "image":
            assert m["width"] > 0 and m["n_frames"] == 1


def test_decode_features_deterministic_across_partitionings(spark):
    a = mm.decode_features(mm.attach_media(spark, n=20)).toPandas()
    b = mm.decode_features(mm.attach_media(spark, n=20).repartition(7)).toPandas()
    a = a.sort_values("media_id").reset_index(drop=True)
    b = b.sort_values("media_id").reset_index(drop=True)
    assert (a["media_id"] == b["media_id"]).all()
    for fa, fb in zip(a["features"], b["features"]):
        assert list(fa) == list(fb)
    assert all(len(f) == mm.FEATURE_DIM for f in a["features"])


def test_resize_updates_only_images(media):
    out = mm.resize_images(media, 32, 32).collect()
    for r in out:
        if r["kind"] == "image":
            assert r["meta"]["width"] == 32 and r["meta"]["height"] == 32
            assert len(r["payload"]) == 32 * 32 // 8
        else:
            assert len(r["payload"]) == 512


def test_sample_frames_counts(media):
    vids = {r["media_id"]: r["meta"]["n_frames"] for r in media.collect() if r["kind"] == "video"}
    out = mm.sample_frames(media, every_nth=2).toPandas()
    assert set(out["media_id"]) == set(vids)
    counts = out.groupby("media_id").size()
    for mid, nf in vids.items():
        assert counts[mid] == (nf + 1) // 2


def test_real_decoder_stub_raises(spark):
    media = mm.attach_media(spark, n=3)
    with pytest.raises(Exception) as ei:
        mm.decode_features(media, use_fake_decoder=False).collect()
    assert "NotImplementedError" in str(ei.value) or isinstance(
        ei.value, NotImplementedError
    )
