"""sources (csv/parquet readers, shuffled writer) + multimodal plumbing."""

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
import ray.data as rd

from nvtabular_ray.multimodal import attach_binary_column, decode_images, FrameSampleStage
from nvtabular_ray.sources import Shuffle, read_dataset, write_parquet


def test_read_csv_with_names(tmp_path):
    df = pd.DataFrame({"a": [1, 2, 3], "b": ["x", "y", "z"]})
    p = tmp_path / "f.csv"
    df.to_csv(p, index=False, header=False)
    ds = read_dataset(str(p), engine="csv", names=["a", "b"])
    out = ds.to_pandas()
    pd.testing.assert_frame_equal(out, df)


def test_read_jsonl(tmp_path):
    import json

    rows = [
        {"doc_id": 1, "text": "héllo — unicode\nsurvives"},
        {"doc_id": 2, "text": 'quotes " and \\ backslashes'},
        {"doc_id": 3, "text": ""},
    ]
    p = tmp_path / "f.jsonl"
    with open(p, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    ds = read_dataset(str(p), engine="jsonl", columns=["doc_id", "text"])
    out = ds.to_pandas().sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(out, pd.DataFrame(rows))


def test_write_parquet_shuffles(tmp_path, sf_dir):
    ds = read_dataset(f"{sf_dir}/events.parquet", columns=["event_id", "value"])
    out = str(tmp_path / "out")
    write_parquet(ds, out, shuffle=Shuffle.PER_PARTITION, out_files_per_proc=3)
    t = pq.read_table(out)
    assert t.num_rows == 1000
    # same multiset of ids, permuted within partitions
    assert sorted(t.column("event_id").to_pylist()) == list(range(1000))
    files = [f for f in os.listdir(out) if f.endswith(".parquet")]
    assert len(files) == 3


def test_multimodal_decode_pipeline():
    base = rd.range(50)
    with_img = attach_binary_column(base, "image")
    feats = decode_images(with_img, "image", concurrency=2, batch_size=16)
    out = feats.to_pandas()
    assert len(out) == 50
    assert "image_features" in out.columns and "image" not in out.columns
    v = np.asarray(list(out["image_features"].iloc[0]))
    assert v.shape == (32,) and v.sum() == pytest.approx(1.0, rel=1e-5)
    # deterministic across runs
    out2 = decode_images(attach_binary_column(rd.range(50), "image"), "image", concurrency=2, batch_size=16).to_pandas()
    assert np.allclose(
        np.stack(out.sort_values("id")["image_features"].to_list()),
        np.stack(out2.sort_values("id")["image_features"].to_list()),
    )


def test_multimodal_real_decode_rejects_unknown_format():
    """fake=False is a REAL decode path now (PNG/BMP/PPM via stdlib+numpy,
    tests/test_multimodal_codecs.py); formats with no stdlib codec fail
    loudly instead of being silently faked."""
    from nvtabular_ray.multimodal import DecodeImageStage

    stage = DecodeImageStage(fake=False)
    t = pa.table({"image": pa.array([b"xx"], pa.binary())})
    with pytest.raises(ValueError, match="unrecognized image format"):
        stage(t)


def test_frame_sampler():
    base = rd.range(3)
    vids = attach_binary_column(base, "video", payload_fn=lambda i: bytes(range(128)))
    sampler = FrameSampleStage("video", frame_bytes=16, every_k=2)
    out = vids.map_batches(sampler, batch_format="pyarrow", concurrency=2).to_pandas()
    # 128/16 = 8 frames, every 2nd -> 4 per row
    assert len(out) == 12
    assert set(out["frame_idx"]) == {0, 2, 4, 6}
    assert all(len(f) == 16 for f in out["frame"])


def test_frame_sampler_vectorized_matches_slicing():
    """Vectorized gather must equal naive per-row slicing for ragged
    payloads, empty payloads, and trailing partial frames."""
    import numpy as np

    payloads = [
        bytes(range(100)),          # 6 full 16B frames + 4B tail
        b"",                        # no frames
        bytes(range(16)),           # exactly one frame
        bytes(range(256)) * 2,      # 32 frames
        bytes(range(15)),           # sub-frame tail only
    ]
    df = pd.DataFrame({"i": np.arange(len(payloads), dtype="int64")})
    t = pa.Table.from_pandas(df, preserve_index=False).append_column(
        "video", pa.array(payloads, pa.binary())
    )
    out = FrameSampleStage("video", frame_bytes=16, every_k=3)(t)
    exp = []
    for i, p in enumerate(payloads):
        for f in range(0, len(p) // 16, 3):
            exp.append((i, f, p[f * 16 : (f + 1) * 16]))
    got = list(zip(out["i"].to_pylist(), out["frame_idx"].to_pylist(), out["frame"].to_pylist()))
    assert got == exp
