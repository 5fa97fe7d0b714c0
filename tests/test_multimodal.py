"""Multimodal binary-column plumbing (decode stubbed, Ray-side real)."""

import numpy as np
import pyarrow as pa
import pytest

from jsonschema_ray.pipelines.multimodal import (
    DecodeMedia, ExtractMediaFeatures, decode_media, frame_sample_offsets,
    media_features, synth_media_batch)


def test_synth_payload_schema_and_determinism():
    refs = [f"media://{i:016x}" for i in range(50)]
    t1, t2 = synth_media_batch(refs), synth_media_batch(refs)
    assert t1.equals(t2)
    assert t1.schema.names == ["media_ref", "mime", "payload"]
    assert t1.column("payload").type == pa.binary()


def test_decode_stage_direct():
    t = synth_media_batch([f"media://{i:016x}" for i in range(10)])
    # corrupt one payload
    payloads = t.column("payload").to_pylist()
    payloads[3] = b"garbage"
    t = t.set_column(2, "payload", pa.array(payloads, type=pa.binary()))
    out = DecodeMedia()(t)
    ok = out.column("decode_ok").to_pylist()
    assert ok[3] is False and sum(ok) == 9
    w = out.column("width").to_pylist()
    assert all(16 <= x < 64 for i, x in enumerate(w) if i != 3)


def test_decode_strict_raises_without_codec():
    with pytest.raises(NotImplementedError):
        DecodeMedia(allow_fake=False)
    with pytest.raises(NotImplementedError):
        ExtractMediaFeatures(allow_fake=False)


def test_media_pipeline_on_ray(ray_session):
    import ray.data as rd

    from jsonschema_ray.sources.readers import DatasetSource

    t = synth_media_batch([f"media://{i:016x}" for i in range(500)])
    src = DatasetSource(rd.from_arrow(t))
    decoded = decode_media(src, concurrency=2, batch_size=128).to_pandas()
    assert len(decoded) == 500
    assert decoded["decode_ok"].all()

    feats = media_features(src, concurrency=2, batch_size=128).to_pandas()
    assert len(feats) == 500
    v = np.array(feats["features"].iloc[0])
    assert v.shape == (8,)
    assert np.linalg.norm(v) == pytest.approx(1.0, abs=1e-5)


def test_frame_sampling_deterministic():
    n = np.array([0, 1, 5, 100, 1000])
    a = frame_sample_offsets(n, k=4)
    b = frame_sample_offsets(n, k=4)
    assert a == b
    assert a[0] == [] and len(a[1]) == 1 and len(a[3]) == 4
    assert all(0 <= x < 100 for x in a[3])
