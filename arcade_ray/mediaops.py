"""Multimodal (image/audio/video) column operators — Ray plumbing real,
decode kernels stubbed.

Media travels as opaque ``binary`` columns plus typed metadata columns
(media_type, width/height or sample_rate, nbytes). The image/audio
libraries are not in this container, so the decode kernel is either a
clearly-marked NotImplementedError (``strict=True``) or a deterministic
fake (parses our own fixture header) — the schema handling, actor-pool
batching, small-batch sizing for large payloads, and output layout are
real and tested (tests/test_mediaops.py).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

FAKE_MAGIC = b"FAKEIMG1"


def make_fake_image(width: int, height: int, seed: int) -> bytes:
    """Deterministic fixture payload: 8-byte magic, u16 w/h, then
    w*h bytes of 'pixels'."""
    rng = np.random.default_rng(seed)
    header = FAKE_MAGIC + int(width).to_bytes(2, "little") + int(height).to_bytes(2, "little")
    return header + rng.integers(0, 256, width * height, dtype=np.uint8).tobytes()


def _decode_fake(payload: bytes) -> np.ndarray:
    if payload[:8] != FAKE_MAGIC:
        raise ValueError("not a fake image payload")
    w = int.from_bytes(payload[8:10], "little")
    h = int.from_bytes(payload[10:12], "little")
    return np.frombuffer(payload, dtype=np.uint8, count=w * h, offset=12).reshape(h, w)


class ImageFeatureExtractor:
    """Actor-pool stage: decode -> resize(pool) -> feature vector.

    __init__ is the model/kernel load point (once per actor); with no
    real image libs in the sandbox, it wires the fake decoder, or
    raises NotImplementedError in strict mode to mark the integration
    point for PIL/cv2."""

    def __init__(self, out_size: int = 8, strict: bool = False):
        if strict:
            raise NotImplementedError(
                "real image decode requires PIL/cv2 — not in this container; "
                "swap _decode_fake for PIL.Image.open here"
            )
        self.out_size = out_size
        self.decode = _decode_fake

    def _pool(self, img: np.ndarray) -> np.ndarray:
        s = self.out_size
        h, w = img.shape
        ys = (np.arange(s + 1) * h // s).astype(int)
        xs = (np.arange(s + 1) * w // s).astype(int)
        out = np.empty((s, s), dtype=np.float32)
        for i in range(s):
            for j in range(s):
                block = img[ys[i]:max(ys[i + 1], ys[i] + 1),
                            xs[j]:max(xs[j + 1], xs[j] + 1)]
                out[i, j] = float(block.mean())
        return out

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats, means, ok = [], [], []
        for payload in batch["image"]:
            try:
                img = self.decode(payload.as_py())
                pooled = self._pool(img)
                feats.append(pooled.flatten().tolist())
                means.append(float(img.mean()))
                ok.append(True)
            except Exception:
                feats.append([0.0] * (self.out_size ** 2))
                means.append(0.0)
                ok.append(False)
        return pa.table({
            "media_id": batch["media_id"],
            "feature": pa.array(feats, type=pa.list_(pa.float32())),
            "mean_intensity": pa.array(means, type=pa.float64()),
            "decoded": pa.array(ok, type=pa.bool_()),
        })


def extract_image_features(ds, concurrency: int | None = None,
                           batch_size: int = 64):
    """Large binary payloads -> SMALL batch_size so batch x concurrency
    stays inside the worker heap (guide: memory-aware batch sizing).
    The pool leaves >=1 CPU for the read stage."""
    if concurrency is None:
        import ray

        avail = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
        concurrency = max(1, min(8, avail - 1))
    return ds.map_batches(
        ImageFeatureExtractor, batch_format="pyarrow",
        batch_size=batch_size, concurrency=concurrency,
    )
