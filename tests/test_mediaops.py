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


def test_audio_extractor_unit():
    from arcade_ray.mediaops import AudioFeatureExtractor, make_fake_audio

    n = 6
    tab = pa.table({
        "media_id": pa.array(np.arange(n), type=pa.int64()),
        "audio": pa.array(
            [make_fake_audio(4000 + 100 * i, 16000, seed=i) for i in range(n - 1)]
            + [b"junk"], type=pa.binary()),
    })
    ex = AudioFeatureExtractor(n_frames=8, n_bands=4)
    out = ex(tab)
    assert len(out["feature"][0].as_py()) == 2 * 8 + 4
    assert out["decoded"].to_pylist() == [True] * (n - 1) + [False]
    assert out["sample_rate"].to_pylist()[0] == 16000


def test_audio_strict_marks_integration_point():
    from arcade_ray.mediaops import AudioFeatureExtractor

    with pytest.raises(NotImplementedError):
        AudioFeatureExtractor(strict=True)


def test_video_frame_sampling_to_image_features(ray_session):
    """Video container -> sampled frames -> image features: the full
    multimodal chain through actor pools."""
    import ray.data as rd

    from arcade_ray.mediaops import (
        extract_image_features,
        make_fake_video,
        sample_frames,
    )

    n = 6
    tab = pa.table({
        "media_id": pa.array(np.arange(n), type=pa.int64()),
        "video": pa.array(
            [make_fake_video(16, 12, n_frames=8, seed=i * 10) for i in range(n)],
            type=pa.binary()),
    })
    ds = rd.from_arrow(tab)
    frames = sample_frames(ds, every=4, concurrency=2)
    feats = extract_image_features(frames, concurrency=2)
    out = feats.to_pandas()
    assert len(out) == n * 2  # frames 0 and 4 kept per video
    assert out["decoded"].all()


def test_resize_images_roundtrip(ray_session):
    """Resize emits re-decodable payloads at the target geometry; the
    output chains into the feature extractor (decode -> resize ->
    extract composes)."""
    import ray.data as rd

    from arcade_ray.collect import collect_arrow
    from arcade_ray.mediaops import (_decode_fake, extract_image_features,
                                     make_fake_image, resize_images)

    rows = [{"media_id": i, "image": make_fake_image(40 + i % 17, 30 + i % 7, i)}
            for i in range(40)]
    ds = rd.from_items(rows)
    out = collect_arrow(resize_images(ds, width=16, height=12,
                                      concurrency=2, batch_size=8))
    assert out.num_rows == 40
    assert out["decoded"].to_pylist() == [True] * 40
    img = _decode_fake(out["image"][0].as_py())
    assert img.shape == (12, 16)
    feats = collect_arrow(extract_image_features(
        rd.from_arrow(out.select(["media_id", "image"])), concurrency=2))
    assert feats.num_rows == 40 and all(feats["decoded"].to_pylist())
