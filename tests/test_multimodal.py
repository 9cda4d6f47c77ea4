"""Multimodal stages: stubbed decode, real Ray plumbing."""

import numpy as np
import pytest

import ray.data as rd

from siem_on_amazon_opensearch_service_ray.stages import multimodal as mm


def test_image_features_pipeline(ray_session):
    tbl = mm.synth_media_table(50, "image")
    ds = rd.from_arrow(tbl)
    out = mm.media_pipeline(ds, mm.ImageFeatures, concurrency=2).to_pandas()
    assert len(out) == 50
    assert all(len(f) == 22 for f in out["feature"])  # 3 mean + 3 std + 16
    assert (out["width"] >= 16).all()
    # determinism: same payload -> same feature
    out2 = mm.media_pipeline(rd.from_arrow(tbl), mm.ImageFeatures,
                             concurrency=2).to_pandas()
    a = [list(f) for f in out.sort_values("media_id")["feature"]]
    b = [list(f) for f in out2.sort_values("media_id")["feature"]]
    assert a == b


def test_audio_features(ray_session):
    ds = rd.from_arrow(mm.synth_media_table(20, "audio"))
    out = mm.media_pipeline(ds, mm.AudioFeatures, concurrency=2).to_pandas()
    assert len(out) == 20
    row = out.iloc[0]
    assert row["n_frames"] == len(row["rms"]) == len(row["zcr"])
    assert all(0 <= z <= 1 for z in row["zcr"])


def test_frame_sampler_explodes(ray_session):
    tbl = mm.synth_media_table(10, "video")
    out = mm.media_pipeline(rd.from_arrow(tbl), mm.FrameSampler,
                            concurrency=2, every_k=10).to_pandas()
    import json
    metas = [json.loads(m) for m in tbl.column("meta").to_pylist()]
    expected = sum(-(-m["frames"] // 10) for m in metas)
    assert len(out) == expected
    assert (out["frame_idx"] % 10 == 0).all()


def test_real_decoder_stub_raises():
    with pytest.raises(NotImplementedError):
        mm.real_decode_unavailable(b"x", {})
    st = mm.ImageFeatures(decode_fn=mm.real_decode_unavailable)
    with pytest.raises(NotImplementedError):
        st(mm.synth_media_table(1, "image"))
