"""Multimodal-column plumbing tests: schemas, batch shapes, determinism,
and the metadata-only fast path."""

from __future__ import annotations

from pyspark.sql import functions as F

from rdfproject_msc_spark.operators import multimodal
from rdfproject_msc_spark.sources.tables import load_table


def _assets(spark, sf_dir):
    return multimodal.attach_assets(load_table(spark, sf_dir, "documents"))


def test_attach_assets_schema(spark, sf_dir):
    assets = _assets(spark, sf_dir)
    dtypes = dict(assets.dtypes)
    assert dtypes["content"] == "binary"
    assert dtypes["modality"] == "string"
    assert dtypes["meta"].startswith("struct<n_bytes:bigint")
    mods = {r.modality for r in assets.select("modality").distinct().collect()}
    assert mods == {"image", "audio", "video"}


def test_decode_deterministic_and_total(spark, sf_dir):
    assets = _assets(spark, sf_dir)
    a = sorted(map(tuple, multimodal.decode_assets(assets).collect()))
    b = sorted(map(tuple, multimodal.decode_assets(assets).collect()))
    assert a == b  # fake decoder is a pure function of the bytes
    assert len(a) == assets.count()  # decode is total: one row per asset
    # declared schema bounds hold
    df = multimodal.decode_assets(assets)
    bad = df.filter(
        (F.col("width") < 0) | (F.col("width") > 64) | (~F.col("ok"))
    ).count()
    assert bad == 0


def test_resize_contract(spark, sf_dir):
    out = multimodal.resize_images(_assets(spark, sf_dir), width=8, height=4)
    rows = out.collect()
    assert len(rows) > 0
    for r in rows:
        assert r.out_width == 8 and r.out_height == 4
        assert len(r.content) <= 8 * 4  # byte budget of the fake resize


def test_sample_frames_stride(spark, sf_dir):
    frames = multimodal.sample_frames(_assets(spark, sf_dir), every_n=4)
    rows = frames.collect()
    assert len(rows) > 0
    for r in rows[:50]:
        assert r.frame_idx % 4 == 0
        assert r.byte_offset == r.frame_idx * 16
        assert 0 < len(r.frame) <= 16
    # row-expanding stage: more frames than videos
    n_videos = (
        _assets(spark, sf_dir).filter(F.col("modality") == "video").count()
    )
    assert len(rows) >= n_videos


def test_stats_prunes_content_column(spark, sf_dir):
    """asset_stats must not read the payload: the optimized plan's scan
    schema excludes the content column (column pruning is the point of the
    metadata-beside-payload design)."""
    stats = multimodal.asset_stats(_assets(spark, sf_dir))
    plan = stats._jdf.queryExecution().optimizedPlan().toString()
    assert "content" not in plan


def test_empty_content_rows(spark):
    docs = spark.createDataFrame(
        [(0, ""), (1, ""), (2, "")], "doc_id long, text string"
    )
    assets = multimodal.attach_assets(docs)
    decoded = {r.doc_id: r for r in multimodal.decode_assets(assets).collect()}
    assert len(decoded) == 3
    assert all(not r.ok for r in decoded.values())
    assert multimodal.sample_frames(assets).count() == 0
    for r in multimodal.resize_images(assets).collect():
        assert r.content == b""
