"""Multimodal plumbing, config layering, jsonl sink tests."""

import os

import pytest
from pyspark.sql import functions as F

from mammoth_spark.config import EngineConfig, load_config, write_example_config
from mammoth_spark.functions.multimodal import (
    decode_image,
    documents_as_media,
    extract_features,
    fake_feature_extractor,
    media_stats,
)
from mammoth_spark.model import read_table


def test_decode_stubs_raise():
    # without PIL the disclosed NotImplementedError stub fires; WITH PIL
    # installed the real codec path runs and a truncated JPEG raises
    # PIL's own error instead — both are the documented contract
    try:
        import PIL  # noqa: F401

        has_pil = True
    except ImportError:
        has_pil = False
    if has_pil:
        with pytest.raises(Exception) as exc_info:
            decode_image(b"\xff\xd8")
        assert not isinstance(exc_info.value, NotImplementedError)
    else:
        with pytest.raises(NotImplementedError):
            decode_image(b"\xff\xd8")


def test_fake_extractor_deterministic():
    a = fake_feature_extractor(b"hello", dim=8)
    b = fake_feature_extractor(b"hello", dim=8)
    assert a == b
    assert len(a) == 8
    assert all(-1.0 <= x <= 1.0 for x in a)


def test_extract_features_end_to_end(spark, sf_dir):
    media = documents_as_media(read_table(spark, sf_dir, "documents"))
    feats = extract_features(media)
    rows = feats.collect()
    assert len(rows) == media.count()
    by_id = {r["media_id"]: r for r in rows}
    # content hash equals md5 of the text bytes; feature dim stable
    import hashlib

    doc0 = read_table(spark, sf_dir, "documents").filter(F.col("doc_id") == 0).collect()[0]
    assert by_id[0]["content_hash"] == hashlib.md5(doc0["text"].encode()).hexdigest()
    assert all(len(r["feature"]) == 8 for r in rows)
    assert all(r["n_bytes"] > 0 for r in rows)


def test_media_stats_covers_all_types(spark, sf_dir):
    media = documents_as_media(read_table(spark, sf_dir, "documents"))
    stats = {r["media_type"]: r for r in media_stats(media).collect()}
    assert set(stats) == {"image", "audio", "video"}
    assert all(r["total_bytes"] > 0 for r in stats.values())


def test_config_layering(tmp_path, monkeypatch):
    yaml_path = str(tmp_path / "config.yml")
    write_example_config(yaml_path)
    cfg = load_config(yaml_path)
    assert cfg.sync.batch_max_items == 25_000  # reference default config.go:49
    assert cfg.sync.tables == ["public.users"]

    monkeypatch.setenv("MAMMOTH_SYNC_BATCH_MAX_ITEMS", "100")
    monkeypatch.setenv("MAMMOTH_SYNC_TABLES", "a,b")
    cfg = load_config(yaml_path)
    assert cfg.sync.batch_max_items == 100  # env wins over yaml
    assert cfg.sync.tables == ["a", "b"]
    cfg.target.root_dir = "/tmp/t"
    cfg.validate()


def test_config_validation_errors():
    cfg = EngineConfig()
    cfg.sync.batch_max_items = -1
    with pytest.raises(ValueError) as exc:
        cfg.validate()
    msg = str(exc.value)
    assert "batch_max_items" in msg and "tables" in msg and "root_dir" in msg


def test_jsonl_sink_roundtrip(spark, tmp_path):
    from mammoth_spark.model import events_as_change_log
    from mammoth_spark.streaming.sinks import dump_jsonlines

    log = events_as_change_log(read_table(spark, os.environ.get(
        "SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001"), "events"))
    out = str(tmp_path / "jsonl")
    dump_jsonlines(log, out)
    back = spark.read.json(out)
    assert back.count() == log.count()
    assert set(back.columns) == set(log.columns)


def test_resize_images_plumbing(spark, sf_dir):
    import hashlib

    from mammoth_spark.functions.multimodal import fake_resize_kernel, resize_images

    media = documents_as_media(read_table(spark, sf_dir, "documents"))
    out = resize_images(media, 224, 224)
    rows = out.collect()
    # only image rows pass through, and the filter runs JVM-side
    assert len(rows) == media.filter(F.col("media_type") == "image").count()
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.index("Filter") > plan.index("MapInPandas") or "image" in plan
    # payload bytes are the deterministic kernel's output, length == n_bytes
    doc0 = read_table(spark, sf_dir, "documents").filter(F.col("doc_id") == 0).collect()[0]
    r0 = next(r for r in rows if r["media_id"] == 0)
    expect = fake_resize_kernel(doc0["text"].encode(), 224, 224)
    assert bytes(r0["content"]) == expect
    assert r0["n_bytes"] == len(expect) <= 784
    assert r0["orig_hash"] == hashlib.md5(doc0["text"].encode()).hexdigest()


def test_sample_frames_plumbing(spark, sf_dir):
    import hashlib

    from mammoth_spark.functions.multimodal import sample_frames

    media = documents_as_media(read_table(spark, sf_dir, "documents"))
    frames = sample_frames(media, fps=1.0, max_frames=5)
    rows = frames.collect()
    vids = {
        r["media_id"]: r
        for r in media.filter(F.col("media_type") == "video")
        .select("media_id", "content", F.col("meta.duration_ms").alias("d"))
        .collect()
    }
    by_vid = {}
    for r in rows:
        by_vid.setdefault(r["media_id"], []).append(r)
    assert set(by_vid) == set(vids)  # every video sampled, nothing else
    for mid, fr in by_vid.items():
        d = vids[mid]["d"]
        n = max(1, min(5, int(d / 1000)))
        idxs = sorted(r["frame_idx"] for r in fr)
        assert idxs == list(range(n))
        for r in fr:
            assert r["frame_ts_ms"] == r["frame_idx"] * d // n
            content = bytes(vids[mid]["content"])
            tag = content + b":" + str(r["frame_idx"]).encode()
            assert r["frame_hash"] == hashlib.md5(tag).hexdigest()
            assert bytes(r["frame"]) == hashlib.md5(tag).digest()
