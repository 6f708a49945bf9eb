"""Multimodal stages: real Ray plumbing (schema, actor-pool signature,
batch handling) with the stub codec; the codec itself is pluggable."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from t_digest_ray.stages.multimodal import (EmbedStub, FakeCodec, FrameSample,
                                            ImageDecode, ImageResize)


def _media_table(n=10):
    payloads = [bytes([i % 251] * (50 + i * 37)) for i in range(n)]
    payloads[3] = None
    payloads[7] = b""
    return pa.table({"doc_id": pa.array(range(n), type=pa.int64()),
                     "payload": pa.array(payloads, type=pa.binary())})


def test_decode_schema_and_determinism():
    t = _media_table()
    out1 = ImageDecode()(t)
    out2 = ImageDecode()(t)
    assert out1.equals(out2)
    assert {"width", "height", "channels", "decode_ok"} <= \
        set(out1.column_names)
    ok = out1["decode_ok"].to_numpy(zero_copy_only=False)
    assert not ok[3] and not ok[7] and ok[0]
    w = out1["width"].to_numpy()
    assert (w[ok] >= 16).all() and (w[ok] <= 639).all()
    assert (w[~ok] == 0).all()


def test_decode_strict_raises_without_codec():
    with pytest.raises(NotImplementedError):
        ImageDecode(strict=True)


def test_resize_plan_preserves_aspect():
    t = ImageDecode()(_media_table())
    out = ImageResize(max_side=100)(t)
    w = out["width"].to_numpy().astype(float)
    tw = out["target_width"].to_numpy().astype(float)
    th = out["target_height"].to_numpy().astype(float)
    s = out["resize_scale"].to_numpy()
    h = out["height"].to_numpy().astype(float)
    assert (np.maximum(tw, th) <= 100).all()
    assert (s <= 1.0).all()
    # upscale never happens; both dims follow the same scale within rounding
    assert np.all(np.abs(tw - np.maximum(1, w * s)) <= 0.5 + 1e-9)
    assert np.all(np.abs(th - np.maximum(1, h * s)) <= 0.5 + 1e-9)


def test_frame_sample_deterministic_sorted():
    t = _media_table()
    out = FrameSample(k=5)(t)
    frames = out["sampled_frames"].to_pylist()
    nf = out["n_frames"].to_numpy()
    for f, n in zip(frames, nf):
        assert len(f) == min(5, n)
        assert f == sorted(f)
        assert all(0 <= x < n for x in f)
    assert nf[3] == 0 and frames[3] == []


def test_embed_stub_normalized_and_stable():
    t = _media_table()
    e1 = EmbedStub(dim=32)(t)
    e2 = EmbedStub(dim=32)(t)
    v1 = np.stack(e1["embedding"].to_pylist())
    v2 = np.stack(e2["embedding"].to_pylist())
    assert np.allclose(v1, v2)
    norms = np.linalg.norm(v1, axis=1)
    nonzero = v1.any(axis=1)
    assert np.allclose(norms[nonzero], 1.0, atol=1e-5)


def test_actor_pool_pipeline(ray_session):
    """End-to-end through Ray: actor-pool decode -> resize -> embed."""
    import ray.data as rd

    ds = rd.from_arrow(_media_table(40))
    out = (ds.map_batches(ImageDecode, batch_format="pyarrow",
                          concurrency=2, batch_size=8)
           .map_batches(ImageResize(), batch_format="pyarrow")
           .map_batches(EmbedStub, batch_format="pyarrow",
                        concurrency=2, batch_size=8))
    df = out.to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert len(df) == 40
    assert {"width", "target_width", "embedding"} <= set(df.columns)
    # identical results to the local single-process path
    local = EmbedStub()(ImageResize()(ImageDecode()(_media_table(40))))
    ldf = local.to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert (df["target_width"] == ldf["target_width"]).all()
    assert np.allclose(np.stack(df["embedding"]), np.stack(ldf["embedding"]))
