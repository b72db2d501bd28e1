"""Multimodal plumbing + route assembly + stateful streaming operator."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from augdiff_pipeline_spark import fixtures
from augdiff_pipeline_spark.geometry import assembly, core
from augdiff_pipeline_spark.operators import images as imgcodec
from augdiff_pipeline_spark.operators import multimodal as mm


def test_image_features(spark):
    df = spark.createDataFrame(fixtures.image_rows(50))
    feats = mm.image_features(df).toPandas().set_index("image_id")
    assert len(feats) == 50
    src = fixtures.image_rows(50).set_index("image_id")
    for iid in list(feats.index)[:5]:
        arr = imgcodec.decode(bytes(src.loc[iid, "bytes"]))
        assert feats.loc[iid, "phash"] == imgcodec.phash64(arr)
        assert abs(feats.loc[iid, "mean_r"] - arr[..., 0].mean()) < 1e-9
        thumb = np.frombuffer(feats.loc[iid, "thumb_bytes"], dtype=np.uint8).reshape(8, 8, 3)
        assert abs(thumb.mean() - arr.mean()) < 16  # block means track the source


def test_resize_block_mean_identity():
    rng = np.random.default_rng(0)
    arr = rng.integers(0, 256, (32, 32, 3), dtype=np.uint8)
    same = mm.resize_block_mean(arr, 32, 32)
    assert (same == arr).all()
    half = mm.resize_block_mean(arr, 16, 16)
    assert half.shape == (16, 16, 3)
    assert abs(half.astype(float).mean() - arr.astype(float).mean()) < 1.0


def test_video_frame_sampling(spark):
    rng = np.random.default_rng(1)
    rows = []
    for i in range(4):
        frames = rng.integers(0, 256, (12, 16, 16, 3), dtype=np.uint8)
        rows.append((f"v{i}", mm.encode_fake_video(frames)))
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["video_id", "bytes"]))
    out = mm.sample_frames(df, every_n=5).toPandas()
    assert sorted(out[out["video_id"] == "v0"]["frame_no"]) == [0, 5, 10]
    # real container -> clearly-marked stub error
    bad = spark.createDataFrame(pd.DataFrame([("x", b"\x00\x00\x00\x18ftypmp42")], columns=["video_id", "bytes"]))
    with pytest.raises(Exception, match="NotImplementedError|AV codec"):
        mm.sample_frames(bad).collect()


def test_audio_energy(spark):
    rate = 16000
    t = np.arange(rate)  # 1 second
    pcm = (np.sin(2 * np.pi * 440 * t / rate) * 10000).astype(np.int16)
    df = spark.createDataFrame(pd.DataFrame([("a1", mm.encode_fake_audio(pcm, rate))], columns=["audio_id", "bytes"]))
    out = mm.audio_energy_windows(df, window_ms=100).toPandas()
    assert len(out) == 10
    assert (abs(out["rms"] - 10000 / np.sqrt(2)) < 100).all()  # sine RMS = A/sqrt(2)


def test_route_assembly():
    segs = [
        core.LineString(np.array([[0, 0], [1, 0]], float)),
        core.LineString(np.array([[1, 0], [2, 0]], float)),
        core.LineString(np.array([[5, 5], [6, 6]], float)),
    ]
    out = assembly.build_route(["forward", "forward", "forward"], segs)
    assert isinstance(out["forward"], core.MultiLineString)
    joined, stray = out["forward"].lines
    assert len(joined) == 3 and len(stray) == 2


def test_stateful_entity_actions(spark, tmp_path):
    from augdiff_pipeline_spark.streaming.stateful import entity_actions_stream

    src = str(tmp_path / "changes")
    ckpt = str(tmp_path / "ckpt")
    rows = [
        (1, "node", 1, True), (1, "node", 2, True), (2, "way", 1, True),
        (2, "way", 2, False), (3, "node", 1, True), (1, "node", 1, True),
    ]
    pdf = pd.DataFrame(rows, columns=["id", "type", "version", "visible"])
    spark.createDataFrame(pdf).write.parquet(src)
    stream = spark.readStream.schema("id long, type string, version long, visible boolean").parquet(src)
    q = (
        entity_actions_stream(stream)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName("actions")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["id"], r["type"], r["version"]): r["action"]
        for r in spark.sql("select * from actions").collect()
    }
    assert got[(1, "node", 1)] in ("create", "out_of_order")  # duplicate v1 row order-dependent
    assert got[(1, "node", 2)] == "modify"
    assert got[(2, "way", 2)] == "delete"
    assert got[(3, "node", 1)] == "create"
