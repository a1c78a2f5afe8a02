"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed by actor-pool map_batches stages.

The Ray-side mechanics here are real and tested — schema, small batch
sizes for wide binary rows, actor signature, output layout. The actual
codec work is STUBBED: the container ships no image/audio libraries, so
``decode_image`` raises NotImplementedError unless a library is present
(import-try seam) and the default pipeline uses ``fake_decode`` — a
deterministic header parse of the synthetic payload format. A real
decoder drops into MediaDecodeActor.decode without touching the
pipeline shape.

Payload format for the synthetic generator (deterministic):
  b"IMG1" + width:uint16 + height:uint16 + channels:uint8 + raw bytes
Wide-row guidance: batch_size stays SMALL (64-256) so
batch x concurrency fits worker heaps; blocks of binary rows should not
be split absurdly small — raise target_max_block_size instead.
"""

from __future__ import annotations

import struct

import numpy as np
import pyarrow as pa

MAGIC = b"IMG1"


def make_fake_image(width: int, height: int, channels: int, seed: int) -> bytes:
    rng = np.random.RandomState(seed)
    raw = rng.randint(0, 256, size=width * height * channels, dtype=np.uint8).tobytes()
    return MAGIC + struct.pack("<HHB", width, height, channels) + raw


def generate_media_table(n: int = 64, seed: int = 42) -> pa.Table:
    """Synthetic media table: (media_id, kind, payload:binary, meta)."""
    rng = np.random.RandomState(seed)
    ids, kinds, payloads, widths, heights = [], [], [], [], []
    for i in range(n):
        w = int(rng.choice([32, 48, 64]))
        h = int(rng.choice([32, 48, 64]))
        ids.append(i)
        kinds.append("image")
        widths.append(w)
        heights.append(h)
        payloads.append(make_fake_image(w, h, 3, seed + i))
    return pa.table(
        {
            "media_id": pa.array(ids, pa.int64()),
            "kind": pa.array(kinds, pa.string()),
            "payload": pa.array(payloads, pa.binary()),
            "width": pa.array(widths, pa.int32()),
            "height": pa.array(heights, pa.int32()),
        }
    )


def decode_image(payload: bytes) -> np.ndarray:
    """Real-decoder seam: uses PIL/cv2 when available, else raises."""
    try:  # pragma: no cover - libs absent in this container
        import PIL.Image  # noqa: F401
        import io

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


class MediaDecodeActor:
    """Actor-pool stage: decode -> per-image features (mean/std per
    channel + a deterministic 'embedding' via downsampled grayscale).
    decode_fn is injected so a real codec swaps in."""

    def __init__(self, decode_fn=fake_decode, feat_dim: int = 64):
        self.decode = decode_fn
        self.feat_dim = feat_dim

    def _features(self, img: np.ndarray) -> tuple[list[float], list[float], np.ndarray]:
        mean = img.reshape(-1, img.shape[2]).mean(axis=0)
        std = img.reshape(-1, img.shape[2]).std(axis=0)
        gray = img.mean(axis=2)
        # fixed-size embedding: resize-by-striding to an 8x8 grid
        ys = np.linspace(0, gray.shape[0] - 1, 8).astype(int)
        xs = np.linspace(0, gray.shape[1] - 1, 8).astype(int)
        emb = gray[np.ix_(ys, xs)].ravel() / 255.0
        return mean.tolist(), std.tolist(), emb.astype(np.float32)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch["media_id"].to_pylist()
        payloads = batch["payload"].to_pylist()
        o_id, o_mean, o_std, o_emb, o_status = [], [], [], [], []
        for i, p in zip(ids, payloads):
            try:
                img = self.decode(p)
                mean, std, emb = self._features(img)
                status = "ok"
            except Exception:  # noqa: BLE001 — skip-and-log semantics
                mean, std, emb = [], [], np.zeros(64, dtype=np.float32)
                status = "decode_error"
            o_id.append(i)
            o_mean.append(mean)
            o_std.append(std)
            o_emb.append(emb)
            o_status.append(status)
        emb_arr = pa.FixedSizeListArray.from_arrays(
            pa.array(np.concatenate(o_emb) if o_emb else np.empty(0, np.float32), pa.float32()),
            64,
        )
        return pa.table(
            {
                "media_id": pa.array(o_id, pa.int64()),
                "channel_mean": pa.array(o_mean, pa.list_(pa.float64())),
                "channel_std": pa.array(o_std, pa.list_(pa.float64())),
                "embedding": emb_arr,
                "decode_status": pa.array(o_status, pa.string()),
            }
        )


def media_features(ds, concurrency=(1, 4), batch_size: int = 64):
    """Wide binary rows -> SMALL batches; actor pool holds the codec."""
    return ds.map_batches(
        MediaDecodeActor,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
    )
