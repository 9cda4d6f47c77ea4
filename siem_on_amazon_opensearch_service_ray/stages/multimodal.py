"""Multimodal columns: image/audio/video as opaque ``binary`` columns
with typed metadata, processed by actor-pool ``map_batches`` stages.

The image/audio codec libraries are not in this container, so the
*decode kernels* are deliberately pluggable: the default is a
deterministic fake decoder (content-hash-seeded), and a
``NotImplementedError`` decoder marks where a real libjpeg/ffmpeg
binding drops in.  Everything Ray-side — schema contract, batch
sizing for large binary payloads, actor signature, output layout — is
real and tested (per the build brief: stub the codec, make the
plumbing real).

Schema contract:
  media table: (media_id: int64, kind: string in {image,audio,video},
                payload: binary, meta: string json
                {width,height|sample_rate,duration_ms|fps,frames})

Scale notes: binary payloads are wide — stages run with small
``batch_size`` and ``batch_format='pyarrow'`` (binary columns do not
round-trip pandas cleanly); decoded frames/features never accumulate
beyond one batch.
"""

from __future__ import annotations

import hashlib
import json

import numpy as np
import pyarrow as pa

import ray.data as rd


def _seed_from_payload(payload: bytes) -> int:
    return int.from_bytes(hashlib.sha256(payload).digest()[:4], "big")


def fake_decode_image(payload: bytes, meta: dict) -> np.ndarray:
    """Deterministic stand-in for a real image decoder: a (h, w, 3)
    uint8 array seeded by the payload hash.  Replace with a libjpeg /
    Pillow call in a full environment."""
    h = int(meta.get("height", 32))
    w = int(meta.get("width", 32))
    rng = np.random.RandomState(_seed_from_payload(payload))
    return rng.randint(0, 256, size=(h, w, 3), dtype=np.uint8)


def fake_decode_audio(payload: bytes, meta: dict) -> np.ndarray:
    """Deterministic stand-in for an audio decoder: float32 PCM."""
    sr = int(meta.get("sample_rate", 16000))
    n = max(1, int(sr * float(meta.get("duration_ms", 100)) / 1000))
    rng = np.random.RandomState(_seed_from_payload(payload))
    return (rng.rand(n).astype(np.float32) * 2 - 1)


def real_decode_unavailable(payload: bytes, meta: dict):
    raise NotImplementedError(
        "real media codecs are not available in this container; "
        "plug a decoder into the stage's decode_fn")


class ImageFeatures:
    """Actor-pool stage: decode -> resize (area-mean pooling, pure
    numpy) -> channel-statistics feature vector.  decode_fn is injected
    state (loaded once per actor — where a model/codec handle lives)."""

    def __init__(self, decode_fn=fake_decode_image, out_size: int = 8):
        self.decode = decode_fn
        self.out_size = out_size

    def _resize(self, img: np.ndarray) -> np.ndarray:
        s = self.out_size
        h, w, c = img.shape
        ys = (np.arange(s + 1) * h // s)
        xs = (np.arange(s + 1) * w // s)
        out = np.empty((s, s, c), dtype=np.float32)
        for i in range(s):
            for j in range(s):
                out[i, j] = img[ys[i]:max(ys[i + 1], ys[i] + 1),
                                xs[j]:max(xs[j + 1], xs[j] + 1)].mean(axis=(0, 1))
        return out

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats, widths, heights = [], [], []
        metas = [json.loads(m or "{}") for m in batch.column("meta").to_pylist()]
        for payload, meta in zip(batch.column("payload").to_pylist(), metas):
            img = self.decode(payload, meta)
            small = self._resize(img)
            v = np.concatenate([small.mean(axis=(0, 1)), small.std(axis=(0, 1)),
                                small.reshape(-1)[:16]]).astype(np.float64)
            feats.append([float(x) for x in v])
            heights.append(img.shape[0])
            widths.append(img.shape[1])
        return pa.table({
            "media_id": batch.column("media_id"),
            "width": pa.array(widths, pa.int32()),
            "height": pa.array(heights, pa.int32()),
            "feature": pa.array(feats, pa.list_(pa.float64())),
        })


class AudioFeatures:
    """Actor-pool stage: decode -> frame -> per-frame RMS energy +
    zero-crossing rate (the plumbing for an fbank/spectrogram step)."""

    def __init__(self, decode_fn=fake_decode_audio, frame: int = 400):
        self.decode = decode_fn
        self.frame = frame

    def __call__(self, batch: pa.Table) -> pa.Table:
        rms_out, zcr_out, n_frames = [], [], []
        metas = [json.loads(m or "{}") for m in batch.column("meta").to_pylist()]
        for payload, meta in zip(batch.column("payload").to_pylist(), metas):
            pcm = self.decode(payload, meta)
            n = (pcm.size // self.frame) * self.frame
            if n == 0:
                rms_out.append([])
                zcr_out.append([])
                n_frames.append(0)
                continue
            frames = pcm[:n].reshape(-1, self.frame)
            rms = np.sqrt((frames ** 2).mean(axis=1))
            zcr = (np.diff(np.signbit(frames), axis=1) != 0).mean(axis=1)
            rms_out.append([float(x) for x in rms])
            zcr_out.append([float(x) for x in zcr])
            n_frames.append(frames.shape[0])
        return pa.table({
            "media_id": batch.column("media_id"),
            "n_frames": pa.array(n_frames, pa.int32()),
            "rms": pa.array(rms_out, pa.list_(pa.float64())),
            "zcr": pa.array(zcr_out, pa.list_(pa.float64())),
        })


class FrameSampler:
    """Video frame-sampling plumbing: emits (media_id, frame_idx,
    frame_payload) rows for every k-th frame — the explode shape a real
    ffmpeg-backed sampler produces; the stub slices the payload bytes
    deterministically."""

    def __init__(self, every_k: int = 10):
        self.every_k = every_k

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, idxs, frames = [], [], []
        metas = [json.loads(m or "{}") for m in batch.column("meta").to_pylist()]
        for mid, payload, meta in zip(batch.column("media_id").to_pylist(),
                                      batch.column("payload").to_pylist(),
                                      metas):
            total = int(meta.get("frames", 0))
            for fi in range(0, total, self.every_k):
                lo = (fi * 97) % max(1, len(payload) - 16)
                ids.append(mid)
                idxs.append(fi)
                frames.append(payload[lo:lo + 16])
        return pa.table({
            "media_id": pa.array(ids, pa.int64()),
            "frame_idx": pa.array(idxs, pa.int32()),
            "frame_payload": pa.array(frames, pa.binary()),
        })


def synth_media_table(n: int, kind: str = "image", seed: int = 42) -> pa.Table:
    """Deterministic synthetic media table for tests/bench (no external
    data; payload is random bytes, metadata typed per kind)."""
    rng = np.random.RandomState(seed)
    payloads = [rng.bytes(256 + int(rng.randint(0, 512))) for _ in range(n)]
    if kind == "image":
        metas = [json.dumps({"width": int(rng.randint(16, 64)),
                             "height": int(rng.randint(16, 64))}) for _ in range(n)]
    elif kind == "audio":
        metas = [json.dumps({"sample_rate": 16000,
                             "duration_ms": int(rng.randint(50, 400))})
                 for _ in range(n)]
    else:
        metas = [json.dumps({"fps": 30, "frames": int(rng.randint(30, 120))})
                 for _ in range(n)]
    return pa.table({
        "media_id": pa.array(range(n), pa.int64()),
        "kind": pa.array([kind] * n, pa.string()),
        "payload": pa.array(payloads, pa.binary()),
        "meta": pa.array(metas, pa.string()),
    })


def media_pipeline(ds: rd.Dataset, stage_cls, concurrency: int = 2,
                   batch_size: int = 32, **stage_kwargs) -> rd.Dataset:
    """Wire a media stage as an actor pool with binary-safe settings
    (small batches, Arrow format end-to-end)."""
    return ds.map_batches(stage_cls, fn_constructor_kwargs=stage_kwargs,
                          batch_format="pyarrow", batch_size=batch_size,
                          concurrency=concurrency)
