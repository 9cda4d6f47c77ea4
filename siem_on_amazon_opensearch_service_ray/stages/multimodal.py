"""Multimodal columns: image/audio/video as opaque ``binary`` columns
with typed metadata, processed by actor-pool ``map_batches`` stages.

Decode is REAL for the formats that need no external library — WAV
(stdlib ``wave``), uncompressed BMP and binary P6 PPM (numpy), with
magic-byte dispatch (:func:`decode_image` / :func:`decode_audio`) and
round-trip encoders for fixtures and sinks.  Compressed codecs
(jpeg/png/mp3/mp4) are not in this container, so those payloads raise
through the deliberately pluggable decode_fn slot (a deterministic
fake decoder also ships for plumbing tests).  Everything Ray-side —
schema contract, batch sizing for large binary payloads, actor
signature, output layout — is real and tested.

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
        "no codec for this payload in this container (compressed "
        "formats need libjpeg/ffmpeg); plug a decoder into the "
        "stage's decode_fn — WAV/BMP/PPM decode natively, see "
        "decode_image/decode_audio")


# ---------------------------------------------------------------------------
# REAL codecs for the formats that need no external library:
# WAV (stdlib `wave`), uncompressed 24-bit BMP and binary P6 PPM
# (numpy).  Compressed formats (jpeg/png/mp3/mp4) stay behind the
# pluggable decode_fn — their codecs aren't in this container.


def encode_wav(pcm: np.ndarray, sample_rate: int = 16000) -> bytes:
    """float PCM in [-1, 1] -> 16-bit mono WAV bytes (fixture writer
    and sink)."""
    import io
    import wave
    q = np.clip(np.asarray(pcm, np.float64), -1.0, 1.0)
    i16 = np.round(q * 32767.0).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        w.writeframes(i16.tobytes())
    return buf.getvalue()


def decode_wav(payload: bytes, meta: dict | None = None) -> np.ndarray:
    """WAV bytes -> float32 mono PCM in [-1, 1] (8/16-bit PCM;
    multi-channel averaged to mono).  Pure stdlib `wave`."""
    import io
    import wave
    with wave.open(io.BytesIO(payload), "rb") as w:
        nch, width, n = w.getnchannels(), w.getsampwidth(), w.getnframes()
        raw = w.readframes(n)
    if width == 2:
        x = np.frombuffer(raw, "<i2").astype(np.float32) / 32767.0
    elif width == 1:
        x = (np.frombuffer(raw, np.uint8).astype(np.float32) - 128.0) / 127.0
    else:
        raise NotImplementedError(f"{8 * width}-bit WAV needs a codec")
    if nch > 1:
        x = x.reshape(-1, nch).mean(axis=1)
    return x


def encode_bmp(img: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB -> uncompressed 24-bit BMP bytes
    (BITMAPINFOHEADER, bottom-up rows, BGR on disk, 4-byte row pad)."""
    import struct
    img = np.asarray(img, np.uint8)
    h, w, _ = img.shape
    row = w * 3
    pad = (-row) % 4
    body = bytearray()
    for y in range(h - 1, -1, -1):            # bottom-up
        body += img[y, :, ::-1].tobytes()      # RGB -> BGR
        body += b"\x00" * pad
    size = 14 + 40 + len(body)
    return (struct.pack("<2sIHHI", b"BM", size, 0, 0, 54)
            + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0,
                          len(body), 2835, 2835, 0, 0)
            + bytes(body))


def decode_bmp(payload: bytes, meta: dict | None = None) -> np.ndarray:
    """Uncompressed 24/32-bit BMP -> (h, w, 3) uint8 RGB (numpy only;
    handles bottom-up and top-down rows and the 4-byte row pad)."""
    import struct
    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    off = struct.unpack_from("<I", payload, 10)[0]
    hsz, w, h_signed = struct.unpack_from("<Iii", payload, 14)
    bpp = struct.unpack_from("<H", payload, 28)[0]
    comp = struct.unpack_from("<I", payload, 30)[0] if hsz >= 40 else 0
    if bpp not in (24, 32) or comp not in (0, 3):
        raise NotImplementedError(f"{bpp}-bpp/compression-{comp} BMP "
                                  "needs a codec")
    if comp == 3:
        # BI_BITFIELDS: only the standard BGR(A) masks decode here —
        # honoring arbitrary channel masks needs per-channel shifts
        r_m, g_m, b_m = struct.unpack_from("<III", payload, 54)
        if (r_m, g_m, b_m) != (0x00FF0000, 0x0000FF00, 0x000000FF):
            raise NotImplementedError(
                f"BITFIELDS masks {(r_m, g_m, b_m)} are not the "
                "standard BGR(A) layout; plug a codec")
    h = abs(h_signed)
    nb = bpp // 8
    stride = (w * nb + 3) & ~3
    rows = np.frombuffer(payload, np.uint8, h * stride, off) \
        .reshape(h, stride)[:, :w * nb].reshape(h, w, nb)
    rgb = rows[:, :, 2::-1]                   # BGR(A) -> RGB
    if h_signed > 0:
        rgb = rgb[::-1]                       # bottom-up -> top-down
    return np.ascontiguousarray(rgb)


def encode_ppm(img: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB -> binary P6 PPM bytes."""
    img = np.asarray(img, np.uint8)
    h, w, _ = img.shape
    return f"P6\n{w} {h}\n255\n".encode() + img.tobytes()


def decode_ppm(payload: bytes, meta: dict | None = None) -> np.ndarray:
    """Binary P6 PPM -> (h, w, 3) uint8 RGB (numpy only; tolerates
    comment lines in the header)."""
    if payload[:2] != b"P6":
        raise ValueError("not a P6 PPM payload")
    pos, fields = 2, []
    while len(fields) < 3:
        while pos < len(payload) and payload[pos:pos + 1].isspace():
            pos += 1
        if payload[pos:pos + 1] == b"#":
            pos = payload.index(b"\n", pos) + 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos:pos + 1].isspace():
            pos += 1
        fields.append(int(payload[start:pos]))
    pos += 1                                   # single whitespace after maxval
    w, h, maxv = fields
    if maxv != 255:
        raise NotImplementedError("16-bit PPM needs scaling")
    return np.frombuffer(payload, np.uint8, h * w * 3, pos) \
        .reshape(h, w, 3).copy()


def decode_image(payload: bytes, meta: dict | None = None) -> np.ndarray:
    """Magic-byte dispatch: BMP and PPM decode natively; anything else
    (jpeg/png/...) raises toward the pluggable decode_fn slot."""
    if payload[:2] == b"BM":
        return decode_bmp(payload, meta)
    if payload[:2] == b"P6":
        return decode_ppm(payload, meta)
    return real_decode_unavailable(payload, meta)


def decode_audio(payload: bytes, meta: dict | None = None) -> np.ndarray:
    """Magic-byte dispatch: RIFF/WAVE decodes natively; anything else
    (mp3/flac/...) raises toward the pluggable decode_fn slot."""
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        return decode_wav(payload, meta)
    return real_decode_unavailable(payload, meta)


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


def synth_media_table(n: int, kind: str = "image", seed: int = 42,
                      real: bool = False) -> pa.Table:
    """Deterministic synthetic media table for tests/bench (no external
    data).  ``real=False`` payloads are opaque random bytes (exercise
    the pluggable-decoder plumbing with the fake decoders);
    ``real=True`` payloads are REAL encoded media — BMP images / WAV
    audio from the native codecs above — so the pipeline decodes
    actual bytes end-to-end."""
    rng = np.random.RandomState(seed)
    if kind == "image":
        dims = [(int(rng.randint(16, 64)), int(rng.randint(16, 64)))
                for _ in range(n)]
        metas = [json.dumps({"width": w, "height": h}) for h, w in dims]
        if real:
            payloads = [encode_bmp(rng.randint(0, 256, size=(h, w, 3),
                                               dtype=np.uint8))
                        for h, w in dims]
        else:
            payloads = [rng.bytes(256 + int(rng.randint(0, 512)))
                        for _ in range(n)]
    elif kind == "audio":
        durs = [int(rng.randint(50, 400)) for _ in range(n)]
        metas = [json.dumps({"sample_rate": 16000, "duration_ms": d})
                 for d in durs]
        if real:
            payloads = [encode_wav(rng.rand(16 * d) * 2 - 1, 16000)
                        for d in durs]
        else:
            payloads = [rng.bytes(256 + int(rng.randint(0, 512)))
                        for _ in range(n)]
    else:
        metas = [json.dumps({"fps": 30, "frames": int(rng.randint(30, 120))})
                 for _ in range(n)]
        payloads = [rng.bytes(256 + int(rng.randint(0, 512)))
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
