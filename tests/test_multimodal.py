"""Multimodal plumbing tests: schema, Arrow batch shape, determinism, the
decode stub contract, and blob-column pruning for metadata-only plans."""

import pytest
from pyspark.sql import functions as F

from otel_semconvprocessor_spark.operators.multimodal import (
    decode_and_featurize,
    frame_sample_plan,
    synthetic_media,
)


@pytest.fixture(scope="module")
def media(spark):
    return synthetic_media(spark, 60).cache()


def test_media_schema(media):
    d = dict(media.dtypes)
    assert d["bytes"] == "binary"
    assert d["meta"].startswith("struct<mime:string,width:int")
    assert media.count() == 60
    assert media.select("media_id").distinct().count() == 60


def test_featurize_fake(media):
    out = decode_and_featurize(media, fake=True, feature_dim=8)
    rows = out.collect()
    assert len(rows) == 60
    for r in rows:
        assert len(r["feature"]) == 8
        assert all(0.0 <= x <= 1.0 for x in r["feature"])
        assert r["resized_width"] == 224 and r["resized_height"] == 224
        assert r["n_frames_sampled"] == (4 if r["kind"] == "video" else 1)
        assert r["n_bytes"] == 256  # 8 * 32-char md5, utf-8
    # deterministic across runs
    a = sorted((r["media_id"], tuple(r["feature"])) for r in rows)
    b = sorted(
        (r["media_id"], tuple(r["feature"]))
        for r in decode_and_featurize(media.repartition(7), fake=True, feature_dim=8).collect()
    )
    assert a == b


def test_featurize_real_decode_is_stubbed(media):
    with pytest.raises(Exception, match="NotImplementedError|real media decode"):
        decode_and_featurize(media, fake=False).collect()


def test_frame_sample_plan_prunes_blob(media, tmp_path):
    # write to parquet so column pruning is observable in the scan
    path = str(tmp_path / "media")
    media.write.parquet(path)
    df = media.sparkSession.read.parquet(path)
    plan_df = frame_sample_plan(df, every_ms=10000)
    rows = plan_df.collect()
    assert all(r["sample_ts_ms"][0] == 0 for r in rows)
    physical = plan_df._jdf.queryExecution().executedPlan().toString()
    assert "bytes" not in physical  # blob column pruned from the scan
    assert "ReadSchema" in physical
