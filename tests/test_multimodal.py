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
