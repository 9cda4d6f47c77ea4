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


def test_bmp_roundtrip_and_padding():
    import numpy as np
    rng = np.random.RandomState(3)
    # width 5 -> 15-byte rows force the 4-byte pad path
    for h, w in ((7, 5), (16, 16), (3, 1)):
        img = rng.randint(0, 256, size=(h, w, 3), dtype=np.uint8)
        back = mm.decode_bmp(mm.encode_bmp(img))
        assert back.shape == (h, w, 3)
        assert (back == img).all()


def test_ppm_roundtrip_and_comment_header():
    import numpy as np
    rng = np.random.RandomState(4)
    img = rng.randint(0, 256, size=(6, 9, 3), dtype=np.uint8)
    assert (mm.decode_ppm(mm.encode_ppm(img)) == img).all()
    # comment lines in the header must be skipped
    body = mm.encode_ppm(img)
    hacked = b"P6\n# a comment\n9 6\n255\n" + body.split(b"255\n", 1)[1]
    assert (mm.decode_ppm(hacked) == img).all()


def test_wav_roundtrip():
    import numpy as np
    pcm = np.sin(np.linspace(0, 40, 1600)).astype(np.float32) * 0.7
    back = mm.decode_wav(mm.encode_wav(pcm, 16000))
    assert back.shape == pcm.shape
    assert np.abs(back - pcm).max() < 1.5 / 32767


def test_decode_dispatch_magic_bytes():
    import numpy as np
    img = np.zeros((4, 4, 3), np.uint8)
    assert mm.decode_image(mm.encode_bmp(img)).shape == (4, 4, 3)
    assert mm.decode_image(mm.encode_ppm(img)).shape == (4, 4, 3)
    with pytest.raises(NotImplementedError):
        mm.decode_image(b"\x89PNG\r\n\x1a\n....")
    assert mm.decode_audio(mm.encode_wav(np.zeros(10), 8000)).size == 10
    with pytest.raises(NotImplementedError):
        mm.decode_audio(b"ID3\x04mp3bytes....")


def test_real_media_pipeline_end_to_end(ray_session):
    """REAL bytes through the actor-pool stages: BMP images and WAV
    audio decode natively (no fake decoder), features come out."""
    import json
    import numpy as np
    tbl = mm.synth_media_table(8, "image", real=True)
    out = mm.media_pipeline(rd.from_arrow(tbl), mm.ImageFeatures,
                            concurrency=2, decode_fn=mm.decode_image
                            ).to_pandas().sort_values("media_id")
    metas = [json.loads(m) for m in tbl.column("meta").to_pylist()]
    assert list(out["width"]) == [m["width"] for m in metas]
    assert list(out["height"]) == [m["height"] for m in metas]
    wav = mm.synth_media_table(6, "audio", real=True)
    aout = mm.media_pipeline(rd.from_arrow(wav), mm.AudioFeatures,
                             concurrency=2, decode_fn=mm.decode_audio
                             ).to_pandas()
    assert (aout["n_frames"] > 0).all()
    assert all(len(r) > 0 and max(r) <= 1.0 for r in aout["rms"])
