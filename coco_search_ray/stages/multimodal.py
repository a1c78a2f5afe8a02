"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed by actor-pool map_batches stages
— decode, feature-extract, resize, frame-sample.

The Ray-side mechanics here are real and tested — schema, small batch
sizes for wide binary rows, actor signatures, 1->N frame explosion,
output layouts. The actual codec work is STUBBED: the container ships no
image/audio libraries, so ``decode_image`` raises NotImplementedError
unless a library is present (import-try seam) and the default pipeline
uses the deterministic fake formats below. A real decoder drops into
``MediaDecodeActor(decode_fn=...)`` without touching the pipeline shape.

Deterministic payload formats (synthetic generator):
  IMG1: b"IMG1" + width:u16 + height:u16 + channels:u8 + raw u8 bytes
  AUD1: b"AUD1" + rate:u32 + n_samples:u32 + int16 samples
  VID1: b"VID1" + n_frames:u16 + n_frames x (len:u32 + IMG1 blob)

Wide-row guidance: batch_size stays SMALL (64-256) so
batch x concurrency fits worker heaps; blocks of binary rows should not
be split absurdly small — raise target_max_block_size instead.
"""

from __future__ import annotations

import struct

import numpy as np
import pyarrow as pa

MAGIC = b"IMG1"
MAGIC_AUDIO = b"AUD1"
MAGIC_VIDEO = b"VID1"

EMB_DIM = 64


# ---------------------------------------------------------------------------
# synthetic payloads (deterministic)
# ---------------------------------------------------------------------------


def make_fake_image(width: int, height: int, channels: int, seed: int) -> bytes:
    rng = np.random.RandomState(seed)
    raw = rng.randint(0, 256, size=width * height * channels, dtype=np.uint8).tobytes()
    return MAGIC + struct.pack("<HHB", width, height, channels) + raw


def make_fake_audio(rate: int, n_samples: int, seed: int) -> bytes:
    rng = np.random.RandomState(seed)
    samples = (rng.randn(n_samples) * 3000).astype(np.int16)
    return MAGIC_AUDIO + struct.pack("<II", rate, n_samples) + samples.tobytes()


def make_fake_video(width: int, height: int, n_frames: int, seed: int) -> bytes:
    frames = [make_fake_image(width, height, 3, seed + 31 * f) for f in range(n_frames)]
    out = [MAGIC_VIDEO, struct.pack("<H", n_frames)]
    for fr in frames:
        out.append(struct.pack("<I", len(fr)))
        out.append(fr)
    return b"".join(out)


def generate_media_table(n: int = 64, seed: int = 42, std_formats: bool = False) -> pa.Table:
    """Synthetic media table: (media_id, kind, payload:binary, meta).
    Kinds cycle image/audio/video so every decode path is exercised.
    ``std_formats``: every second image/audio row uses a REAL container
    format (P6 PPM / RIFF WAV) instead of the deterministic fakes, so
    the pure-python decoders run against genuinely mixed-format data
    (videos stay VID1 — there is no trivially-parseable standard video
    container)."""
    rng = np.random.RandomState(seed)
    ids, kinds, payloads, widths, heights = [], [], [], [], []
    for i in range(n):
        w = int(rng.choice([32, 48, 64]))
        h = int(rng.choice([32, 48, 64]))
        kind = ("image", "audio", "video")[i % 3]
        if kind == "image":
            if std_formats and (i // 3) % 2 == 0:
                img = np.random.RandomState(seed + i).randint(
                    0, 256, size=(h, w, 3), dtype=np.uint8
                )
                payloads.append(encode_ppm(img))
            else:
                payloads.append(make_fake_image(w, h, 3, seed + i))
        elif kind == "audio":
            n_samp = 1600 + 16 * int(rng.randint(0, 50))
            if std_formats and (i // 3) % 2 == 0:
                samples = (np.random.RandomState(seed + i).randn(n_samp) * 3000).astype(
                    np.int16
                )
                payloads.append(encode_wav(16000, samples))
            else:
                payloads.append(make_fake_audio(16000, n_samp, seed + i))
            w = h = 0
        else:
            payloads.append(make_fake_video(w, h, 4 + int(rng.randint(0, 5)), seed + i))
        ids.append(i)
        kinds.append(kind)
        widths.append(w)
        heights.append(h)
    return pa.table(
        {
            "media_id": pa.array(ids, pa.int64()),
            "kind": pa.array(kinds, pa.string()),
            "payload": pa.array(payloads, pa.binary()),
            "width": pa.array(widths, pa.int32()),
            "height": pa.array(heights, pa.int32()),
        }
    )


# ---------------------------------------------------------------------------
# REAL container formats, pure-python decoders (no external codec libs):
# WAV (RIFF little-endian, PCM16) and PPM (P6, 8-bit). The struct-based
# parsers here are independent of the stdlib ``wave`` writer used for
# encoding, so the round-trip test cross-validates two implementations.
# ---------------------------------------------------------------------------


def encode_wav(rate: int, samples: np.ndarray) -> bytes:
    """PCM16 mono WAV via the stdlib ``wave`` module (the reference
    writer our hand-rolled RIFF parser is tested against)."""
    import io
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(samples.astype("<i2").tobytes())
    return buf.getvalue()


def decode_wav(payload: bytes) -> tuple[int, np.ndarray]:
    """Hand-rolled RIFF/WAVE chunk walker: validates the RIFF header,
    walks chunks to 'fmt ' (must be PCM, 16-bit) and 'data'. Returns
    (sample_rate, int16 samples, channel-interleaved flattened)."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos = 12
    rate = None
    data = None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        (size,) = struct.unpack("<I", payload[pos + 4 : pos + 8])
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt_tag, _channels, rate, _br, _ba, bits = struct.unpack("<HHIIHH", body[:16])
            if fmt_tag != 1 or bits != 16:
                raise ValueError(f"unsupported WAV encoding (fmt={fmt_tag}, bits={bits})")
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if rate is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    return int(rate), np.frombuffer(data, dtype="<i2")


def encode_ppm(img: np.ndarray) -> bytes:
    """Binary PPM (P6), 8-bit RGB."""
    h, w, c = img.shape
    if c != 3:
        raise ValueError("PPM is RGB")
    return b"P6\n%d %d\n255\n" % (w, h) + img.astype(np.uint8).tobytes()


def decode_ppm(payload: bytes) -> np.ndarray:
    """P6 parser: whitespace-delimited header tokens (with '#' comment
    support), then raw RGB bytes."""
    if payload[:2] != b"P6":
        raise ValueError("not a P6 PPM payload")
    tokens: list[bytes] = []
    pos = 2
    while len(tokens) < 3:
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":  # comment to end of line
            while pos < len(payload) and payload[pos : pos + 1] != b"\n":
                pos += 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        tokens.append(payload[start:pos])
    pos += 1  # single whitespace after maxval
    w, h, maxval = (int(t) for t in tokens)
    if maxval != 255:
        raise ValueError("only 8-bit PPM supported")
    return np.frombuffer(payload[pos : pos + w * h * 3], dtype=np.uint8).reshape(h, w, 3)


def sniff_format(payload: bytes) -> str:
    """Container format by magic: 'wav' | 'ppm' | 'img1' | 'aud1' |
    'vid1' | 'unknown'."""
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        return "wav"
    if payload[:2] == b"P6":
        return "ppm"
    if payload[:4] == MAGIC:
        return "img1"
    if payload[:4] == MAGIC_AUDIO:
        return "aud1"
    if payload[:4] == MAGIC_VIDEO:
        return "vid1"
    return "unknown"


# ---------------------------------------------------------------------------
# decoders (stub seam + deterministic fakes)
# ---------------------------------------------------------------------------


def decode_image(payload: bytes) -> np.ndarray:
    """Real-decoder seam: uses PIL when available, else raises."""
    try:  # pragma: no cover - libs absent in this container
        import io

        import PIL.Image  # noqa: F401

        return np.asarray(PIL.Image.open(io.BytesIO(payload)))
    except ImportError as e:
        raise NotImplementedError(
            "no image codec available in this environment; use fake_decode "
            "for the synthetic IMG1 format or install a codec"
        ) from e


def fake_decode(payload: bytes) -> np.ndarray:
    """Deterministic decode of the synthetic IMG1 payload."""
    assert payload[:4] == MAGIC, "not an IMG1 payload"
    w, h, c = struct.unpack("<HHB", payload[4:9])
    return np.frombuffer(payload[9:], dtype=np.uint8).reshape(h, w, c)


def encode_fake_image(img: np.ndarray) -> bytes:
    h, w, c = img.shape
    return MAGIC + struct.pack("<HHB", w, h, c) + img.astype(np.uint8).tobytes()


def fake_decode_audio(payload: bytes) -> tuple[int, np.ndarray]:
    assert payload[:4] == MAGIC_AUDIO, "not an AUD1 payload"
    rate, n = struct.unpack("<II", payload[4:12])
    return rate, np.frombuffer(payload[12 : 12 + 2 * n], dtype=np.int16)


def iter_fake_video_frames(payload: bytes):
    """Yield raw IMG1 frame blobs from a VID1 payload (no decode)."""
    assert payload[:4] == MAGIC_VIDEO, "not a VID1 payload"
    (n_frames,) = struct.unpack("<H", payload[4:6])
    pos = 6
    for _ in range(n_frames):
        (ln,) = struct.unpack("<I", payload[pos : pos + 4])
        pos += 4
        yield payload[pos : pos + ln]
        pos += ln


# ---------------------------------------------------------------------------
# feature extraction (actor pool, per-kind dispatch)
# ---------------------------------------------------------------------------


def _image_features(img: np.ndarray) -> tuple[list[float], list[float], np.ndarray]:
    mean = img.reshape(-1, img.shape[2]).mean(axis=0)
    std = img.reshape(-1, img.shape[2]).std(axis=0)
    gray = img.mean(axis=2)
    # fixed-size embedding: resize-by-striding to an 8x8 grid
    ys = np.linspace(0, gray.shape[0] - 1, 8).astype(int)
    xs = np.linspace(0, gray.shape[1] - 1, 8).astype(int)
    emb = gray[np.ix_(ys, xs)].ravel() / 255.0
    return mean.tolist(), std.tolist(), emb.astype(np.float32)


def _audio_features(rate: int, samples: np.ndarray) -> tuple[list[float], list[float], np.ndarray]:
    x = samples.astype(np.float64)
    rms = float(np.sqrt((x**2).mean())) if len(x) else 0.0
    zc = float(np.mean(np.abs(np.diff(np.signbit(x).astype(np.int8))))) if len(x) > 1 else 0.0
    # embedding: 64-bin downsampled |waveform| envelope
    idx = np.linspace(0, max(len(x) - 1, 0), EMB_DIM).astype(int)
    emb = (np.abs(x[idx]) / 32768.0).astype(np.float32) if len(x) else np.zeros(EMB_DIM, np.float32)
    return [rms], [zc], emb


class MediaDecodeActor:
    """Actor-pool stage: per-kind decode -> features + a deterministic
    fixed-size 'embedding'. decode_fn is injected so a real image codec
    swaps in; audio/video use the deterministic fake formats. Video
    features = mean over sampled frames (every ``frame_stride``-th)."""

    def __init__(self, decode_fn=fake_decode, frame_stride: int = 2):
        self.decode = decode_fn
        self.frame_stride = max(1, frame_stride)

    def _one(self, kind: str, payload: bytes):
        fmt = sniff_format(payload)
        if fmt == "ppm":
            return _image_features(decode_ppm(payload))
        if fmt == "wav":
            return _audio_features(*decode_wav(payload))
        if kind == "image":
            return _image_features(self.decode(payload))
        if kind == "audio":
            rate, samples = fake_decode_audio(payload)
            return _audio_features(rate, samples)
        if kind == "video":
            frames = list(iter_fake_video_frames(payload))[:: self.frame_stride]
            feats = [_image_features(self.decode(f)) for f in frames]
            if not feats:
                raise ValueError("empty video")
            mean = np.mean([f[0] for f in feats], axis=0).tolist()
            std = np.mean([f[1] for f in feats], axis=0).tolist()
            emb = np.mean([f[2] for f in feats], axis=0).astype(np.float32)
            return mean, std, emb
        raise ValueError(f"unknown media kind {kind!r}")

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch["media_id"].to_pylist()
        kinds = batch["kind"].to_pylist()
        payloads = batch["payload"].to_pylist()
        o_id, o_kind, o_mean, o_std, o_emb, o_status = [], [], [], [], [], []
        for i, k, p in zip(ids, kinds, payloads):
            try:
                mean, std, emb = self._one(k, p)
                status = "ok"
            except Exception:  # noqa: BLE001 — skip-and-log semantics
                mean, std, emb = [], [], np.zeros(EMB_DIM, dtype=np.float32)
                status = "decode_error"
            o_id.append(i)
            o_kind.append(k)
            o_mean.append(mean)
            o_std.append(std)
            o_emb.append(emb)
            o_status.append(status)
        emb_arr = pa.FixedSizeListArray.from_arrays(
            pa.array(
                np.concatenate(o_emb) if o_emb else np.empty(0, np.float32), pa.float32()
            ),
            EMB_DIM,
        )
        return pa.table(
            {
                "media_id": pa.array(o_id, pa.int64()),
                "kind": pa.array(o_kind, pa.string()),
                "channel_mean": pa.array(o_mean, pa.list_(pa.float64())),
                "channel_std": pa.array(o_std, pa.list_(pa.float64())),
                "embedding": emb_arr,
                "decode_status": pa.array(o_status, pa.string()),
            }
        )


def media_features(ds, concurrency=None, batch_size: int = 64):
    """Wide binary rows -> SMALL batches; actor pool holds the codec."""
    from ..functions.concurrency import auto_pool

    return ds.map_batches(
        MediaDecodeActor,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency or auto_pool(cap=8),
        num_cpus=1,
    )


class MediaValuesActor:
    """Decode each payload to its RAW value stream (audio samples /
    image pixels / sampled-video-frame pixels) plus the scalar feature
    the media query value-checks: RMS for audio, global value mean for
    image/video. Exporting the raw stream lets a SQL oracle re-derive
    the feature independently (sqrt(avg(v*v)) / avg(v)); the decoders
    themselves are pinned by unit tests against the stdlib ``wave``
    reference and PPM round-trips."""

    def __init__(self, frame_stride: int = 2):
        self.frame_stride = max(1, frame_stride)

    def _values(self, kind: str, payload: bytes) -> np.ndarray:
        fmt = sniff_format(payload)
        if fmt == "wav":
            return decode_wav(payload)[1].astype(np.float64)
        if fmt == "ppm":
            return decode_ppm(payload).ravel().astype(np.float64)
        if fmt == "aud1":
            return fake_decode_audio(payload)[1].astype(np.float64)
        if fmt == "img1":
            return fake_decode(payload).ravel().astype(np.float64)
        if fmt == "vid1":
            frames = list(iter_fake_video_frames(payload))[:: self.frame_stride]
            return np.concatenate(
                [fake_decode(f).ravel() for f in frames]
            ).astype(np.float64)
        raise ValueError(f"unknown media payload format for kind {kind!r}")

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch["media_id"].to_pylist()
        kinds = batch["kind"].to_pylist()
        payloads = batch["payload"].to_pylist()
        o_vals, o_feat, o_fmt = [], [], []
        for k, p in zip(kinds, payloads):
            vals = self._values(k, p)
            o_fmt.append(sniff_format(p))
            o_vals.append(vals)
            if k == "audio":
                o_feat.append(float(np.sqrt((vals**2).mean())) if len(vals) else 0.0)
            else:
                o_feat.append(float(vals.mean()) if len(vals) else 0.0)
        return pa.table(
            {
                "media_id": pa.array(ids, pa.int64()),
                "kind": pa.array(kinds, pa.string()),
                "fmt": pa.array(o_fmt, pa.string()),
                "vals": pa.array([v.tolist() for v in o_vals], pa.list_(pa.float64())),
                "feat": pa.array(o_feat, pa.float64()),
            }
        )


def media_values(ds, concurrency=None, batch_size: int = 64, frame_stride: int = 2):
    from ..functions.concurrency import auto_pool

    return ds.map_batches(
        MediaValuesActor,
        fn_constructor_kwargs={"frame_stride": frame_stride},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency or auto_pool(cap=8),
        num_cpus=1,
    )


# ---------------------------------------------------------------------------
# resize + frame-sample stages
# ---------------------------------------------------------------------------


class ImageResizeActor:
    """Actor-pool stage: decode -> nearest-neighbor resize -> re-encode.
    Non-image rows pass through unchanged (their payload is not an
    image). Deterministic: index-grid sampling, no interpolation.

    Container dispatch mirrors MediaDecodeActor._one: the payload is
    magic-sniffed, real P6 PPM decodes via decode_ppm and everything
    else goes through the injected decode_fn — generate_media_table
    (std_formats=True), the documented mixed-format input, interleaves
    PPM with IMG1 and a fake-only decode would assert on the PPM rows."""

    def __init__(self, out_w: int = 16, out_h: int = 16, decode_fn=fake_decode):
        self.out_w, self.out_h = out_w, out_h
        self.decode = decode_fn

    def _decode_image(self, payload: bytes) -> np.ndarray:
        if sniff_format(payload) == "ppm":
            return decode_ppm(payload)
        return self.decode(payload)

    def _resize(self, img: np.ndarray) -> np.ndarray:
        ys = np.linspace(0, img.shape[0] - 1, self.out_h).astype(int)
        xs = np.linspace(0, img.shape[1] - 1, self.out_w).astype(int)
        return img[np.ix_(ys, xs)]

    def __call__(self, batch: pa.Table) -> pa.Table:
        kinds = batch["kind"].to_pylist()
        payloads = batch["payload"].to_pylist()
        o_payload, o_w, o_h = [], [], []
        for k, p in zip(kinds, payloads):
            if k != "image":
                o_payload.append(p)
                o_w.append(0)
                o_h.append(0)
                continue
            img = self._resize(self._decode_image(p))
            o_payload.append(encode_fake_image(img))
            o_w.append(self.out_w)
            o_h.append(self.out_h)
        return pa.table(
            {
                "media_id": batch["media_id"],
                "kind": batch["kind"],
                "payload": pa.array(o_payload, pa.binary()),
                "width": pa.array(o_w, pa.int32()),
                "height": pa.array(o_h, pa.int32()),
            }
        )


def resize_images(ds, out_w: int = 16, out_h: int = 16, concurrency=None, batch_size: int = 64):
    from ..functions.concurrency import auto_pool

    return ds.map_batches(
        ImageResizeActor,
        fn_constructor_kwargs={"out_w": out_w, "out_h": out_h},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency or auto_pool(cap=8),
        num_cpus=1,
    )


def sample_frames(ds, stride: int = 2, batch_size: int = 32):
    """1->N explosion: one row per SAMPLED frame of each video (every
    ``stride``-th frame), payload = the frame's IMG1 blob. Stateless
    tasks — frame slicing is pure byte work, no codec state."""

    def explode(batch: pa.Table) -> pa.Table:
        ids = batch["media_id"].to_pylist()
        kinds = batch["kind"].to_pylist()
        payloads = batch["payload"].to_pylist()
        o_id, o_frame, o_payload = [], [], []
        for i, k, p in zip(ids, kinds, payloads):
            if k != "video":
                continue
            for fi, blob in enumerate(iter_fake_video_frames(p)):
                if fi % stride == 0:
                    o_id.append(i)
                    o_frame.append(fi)
                    o_payload.append(blob)
        return pa.table(
            {
                "media_id": pa.array(o_id, pa.int64()),
                "frame_idx": pa.array(o_frame, pa.int32()),
                "kind": pa.array(["image"] * len(o_id), pa.string()),
                "payload": pa.array(o_payload, pa.binary()),
            }
        )

    return ds.map_batches(explode, batch_format="pyarrow", batch_size=batch_size)
