"""Multimodal stages: real Ray plumbing (schema, actor-pool signature,
batch handling) with the stub codec; the codec itself is pluggable."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from t_digest_ray.stages.multimodal import (BmpCodec, EmbedStub,
                                            FakeCodec, FrameSample,
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


def test_image_dedup_stats_matches_duckdb(ray_session):
    """decode -> exact payload dedup -> per-channel rollup reproduces the
    SQL GROUP BY text answer exactly (the image twin of exact text dedup)."""
    import duckdb
    import pandas as pd

    import __ray_entry__ as e

    sf = "/root/testdata/sf0.001"
    got = e.queries()["image_dedup_stats"](sf).to_pandas() \
        .sort_values("channels").reset_index(drop=True)
    con = duckdb.connect()
    con.execute("CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{sf}/documents.parquet')")
    want = con.execute(e.oracle_sql()["image_dedup_stats"]).df() \
        .sort_values("channels").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want)


def test_image_embed_near_dup_composition(ray_session):
    """Image near-dup over stub embeddings: planted byte-identical payload
    pairs (id, id+10000) must all surface via EmbedStub -> hyperplane-LSH
    candidate banding -> exact cosine verify (cos=1 for identical bytes)."""
    import ray

    from t_digest_ray.stages.ann import embedding_near_dup_pairs

    rng = np.random.default_rng(3)
    payloads = [rng.integers(32, 127, size=rng.integers(50, 400))
                .astype(np.uint8).tobytes() for _ in range(120)]
    ids = list(range(120)) + list(range(10000, 10040))
    blobs = payloads + payloads[:40]  # 40 exact duplicate images
    t = pa.table({"vec_id": pa.array(ids, type=pa.int64()),
                  "payload": pa.array(blobs, type=pa.binary())})
    ds = ray.data.from_arrow(t).repartition(4) \
        .map_batches(EmbedStub(), batch_format="pyarrow") \
        .select_columns(["vec_id", "embedding"])
    pairs = embedding_near_dup_pairs(ds, threshold=0.999).to_pandas()
    got = set(map(tuple, pairs[["id_a", "id_b"]].itertuples(index=False)))
    want = {(i, i + 10000) for i in range(40)}
    assert want <= got  # every planted duplicate image is found


def _make_bmp(w: int, h: int, value: int = 0x40) -> bytes:
    """Minimal valid 24-bit BMP (binary-exact round-trippable)."""
    import struct
    row_bytes = (w * 3 + 3) & ~3
    img_size = row_bytes * h
    off = 14 + 40
    hdr = struct.pack("<2sIHHI", b"BM", off + img_size, 0, 0, off)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, img_size,
                       2835, 2835, 0, 0)
    row = (bytes([value, value + 1, value + 2]) * w).ljust(row_bytes, b"\0")
    return hdr + info + row * h


def test_real_bmp_codec_through_seam(ray_session):
    """ImageDecode with a real header-parsing codec, end-to-end through
    the actor-pool map_batches path; dims come from the actual BMP
    headers, not the payload length."""
    import ray.data as rd

    dims = [(7, 3), (16, 16), (33, 2), (5, 9)]
    payloads = [_make_bmp(w, h) for w, h in dims] + [None, b"notabmp"]
    t = pa.table({"media_id": pa.array(range(len(payloads)),
                                       type=pa.int64()),
                  "payload": pa.array(payloads, type=pa.binary())})
    out = (rd.from_arrow(t).repartition(3)
           .map_batches(ImageDecode(codec=BmpCodec()),
                        batch_format="pyarrow", batch_size=2)
           .to_pandas().sort_values("media_id").reset_index(drop=True))
    for i, (w, h) in enumerate(dims):
        assert (int(out.loc[i, "width"]), int(out.loc[i, "height"])) \
            == (w, h)
        assert int(out.loc[i, "channels"]) == 3
        assert bool(out.loc[i, "decode_ok"])
    assert not out["decode_ok"].to_numpy()[-2:].any()  # None + garbage

    # pixel kernel: round-trip the constant fill through the row padding
    px = BmpCodec().decode_pixels(_make_bmp(7, 3, value=0x10))
    assert px.shape == (3, 7, 3)
    assert set(np.unique(px)) == {0x10, 0x11, 0x12}


def test_wav_codec_and_audio_energy(ray_session):
    """Real RIFF/WAVE parse through the actor-pool stage: energies
    match the closed-form replay; malformed container raises."""
    import io
    import wave

    import pandas as pd
    import ray.data as rd

    from t_digest_ray.stages.multimodal import (
        AudioEnergy,
        WavPcmCodec,
        synth_wav_pcm16,
    )

    ids = np.array([3, 8, 21], dtype=np.int64)
    pay = [synth_wav_pcm16(int(d), 50 + int(d)) for d in ids]
    df = pd.DataFrame({"doc_id": ids, "payload": pay})
    out = (rd.from_pandas(df).repartition(2)
           .map_batches(AudioEnergy, batch_format="pyarrow",
                        concurrency=2)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    for row, d in zip(out.itertuples(), ids):
        n = 50 + int(d)
        i = np.arange(n, dtype=np.int64)
        s = (d * 31 + i * 17) % 65536 - 32768
        assert row.n_samples == n
        assert row.energy == int((s * s).sum())

    # stereo container rejected by the 16-bit-mono contract
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(2)
        w.setsampwidth(2)
        w.setframerate(8000)
        w.writeframes(b"\0\0\0\0")
    with pytest.raises(ValueError):
        WavPcmCodec().decode_samples(buf.getvalue())


def test_tone_synth_dominant_bin_exact():
    from t_digest_ray.stages.multimodal import (AudioDominantFreq,
                                                synth_wav_tone)

    stage = AudioDominantFreq()
    for doc_id in (0, 7, 19, 20, 123):
        wav = synth_wav_tone(doc_id)
        x = stage.codec.decode_samples(wav).astype(np.float64)
        assert len(x) == 256
        got = int(np.argmax(np.abs(np.fft.rfft(x))))
        assert got == 3 + doc_id % 20


def test_dominant_freq_stage_batch(ray_session):
    import pyarrow as pa

    from t_digest_ray.stages.multimodal import (AudioDominantFreq,
                                                synth_wav_tone)

    batch = pa.table({
        "doc_id": pa.array([1, 2, 25], type=pa.int64()),
        "payload": pa.array([synth_wav_tone(i) for i in (1, 2, 25)],
                            type=pa.binary())})
    out = AudioDominantFreq()(batch)
    assert out["dom_bin"].to_pylist() == [4, 5, 8]
    assert "payload" not in out.column_names
