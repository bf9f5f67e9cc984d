"""Multimodal stub plumbing: binary columns through an actor-pool
decode/feature stage (schema, batching, output layout are real)."""

import numpy as np
import pyarrow as pa
import pytest

from arcade_ray.mediaops import (
    FAKE_MAGIC,
    ImageFeatureExtractor,
    extract_image_features,
    make_fake_image,
)


def make_media_table(n=40):
    rng = np.random.default_rng(42)
    payloads = [make_fake_image(16 + int(rng.integers(0, 16)),
                                16 + int(rng.integers(0, 16)), seed=i)
                for i in range(n)]
    payloads[5] = b"corrupted"
    return pa.table({
        "media_id": pa.array(np.arange(n), type=pa.int64()),
        "media_type": pa.array(["image/fake"] * n),
        "image": pa.array(payloads, type=pa.binary()),
    })


def test_strict_mode_marks_integration_point():
    with pytest.raises(NotImplementedError):
        ImageFeatureExtractor(strict=True)


def test_extractor_unit():
    ex = ImageFeatureExtractor(out_size=4)
    out = ex(make_media_table(8))
    assert out["feature"].type == pa.list_(pa.float32())
    assert len(out["feature"][0].as_py()) == 16
    assert out["decoded"].to_pylist()[5] is False
    assert all(out["decoded"].to_pylist()[:5])


def test_pipeline(ray_session):
    import ray.data as rd

    ds = rd.from_arrow(make_media_table(40))
    out = extract_image_features(ds, concurrency=2, batch_size=8).to_pandas()
    assert len(out) == 40
    assert out["decoded"].sum() == 39
    # deterministic features across runs
    out2 = extract_image_features(rd.from_arrow(make_media_table(40)),
                                  concurrency=2, batch_size=8).to_pandas()
    a = out.sort_values("media_id").reset_index(drop=True)
    b = out2.sort_values("media_id").reset_index(drop=True)
    assert (a["mean_intensity"] == b["mean_intensity"]).all()
