"""Multimodal plumbing: Arrow batch shapes, stub behavior, struct assembly."""

import pytest

from vectordb_explorations_spark.operators import multimodal as M
from vectordb_explorations_spark.sources import load_table


def test_feature_extraction_shape(spark, sf_dir):
    docs = load_table(spark, "documents", sf_dir)
    feats = M.extract_features(M.synthesize_assets(docs), feature_dim=8)
    rows = feats.collect()
    assert len(rows) == docs.count()
    r = rows[0]
    assert len(r.feature) == 8
    assert len(r.payload_sha) == 64
    assert 0.0 <= r.byte_entropy <= 8.0
    assert r.n_bytes > 0


def test_feature_extraction_deterministic(spark, sf_dir):
    docs = load_table(spark, "documents", sf_dir).limit(20)
    a = sorted(map(tuple, M.extract_features(M.synthesize_assets(docs)).collect()))
    b = sorted(map(tuple, M.extract_features(M.synthesize_assets(docs)).collect()))
    assert a == b


def test_decode_stub_raises():
    with pytest.raises(NotImplementedError):
        M.decode_image(b"\x89PNG...")


def test_modalities_cycle(spark, sf_dir):
    docs = load_table(spark, "documents", sf_dir)
    assets = M.synthesize_assets(docs)
    mods = {r.modality for r in assets.select("modality").distinct().collect()}
    assert mods == set(M.MODALITIES)


def test_struct_schema(spark, sf_dir):
    docs = load_table(spark, "documents", sf_dir)
    emb = load_table(spark, "embeddings", sf_dir)
    rec = M.multimodal_struct(docs, emb)
    fields = {f.name for f in rec.schema["record"].dataType.fields}
    assert fields == {"text", "lang", "source", "n_chars", "embedding", "label"}


def test_resize_images_shape_and_determinism(spark, sf_dir):
    docs = load_table(spark, "documents", sf_dir).where("doc_id < 200")
    assets = M.synthesize_assets(docs)
    out = M.resize_images(assets, out_w=8, out_h=8)
    rows = out.collect()
    n_images = assets.where("modality = 'image'").count()
    assert len(rows) == n_images and n_images > 0
    assert all(r["out_w"] == 8 and r["out_h"] == 8 for r in rows)
    again = {r["asset_id"]: r["resized_sha"] for r in out.collect()}
    assert {r["asset_id"]: r["resized_sha"] for r in rows} == again


def test_sample_frames_fanout(spark, sf_dir):
    docs = load_table(spark, "documents", sf_dir).where("doc_id < 200")
    assets = M.synthesize_assets(docs)
    frames = M.sample_frames(assets, frame_bytes=64, every_nth=2).collect()
    vids = assets.where("modality = 'video'").count()
    assert vids > 0
    # every video yields >= 1 frame; multi-chunk payloads fan out to > 1
    per_asset = {}
    for r in frames:
        per_asset.setdefault(r["asset_id"], []).append(r)
    assert len(per_asset) == vids
    assert any(len(v) > 1 for v in per_asset.values())
    for rows in per_asset.values():
        for r in rows:
            assert r["byte_offset"] == r["frame_idx"] * 64
            assert r["frame_idx"] % 2 == 0
