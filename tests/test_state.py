"""Workflow save/load round-trip + resumable lineage-tracked transform."""

import json
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
import ray.data as rd

from nvtabular_ray import Workflow, ops
from nvtabular_ray.transcripts import generate_transcripts_pandas


def _ds(df, blocks=3):
    return rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False)).repartition(blocks)


def test_save_load_roundtrip(tmp_path, mixed_df):
    ds = _ds(mixed_df)
    cats = ["name_cat"] >> ops.Categorify(freq_threshold=0)
    conts = ["x", "y"] >> ops.FillMissing(0) >> ops.LogOp() >> ops.Normalize()
    te = ["name_cat"] >> ops.TargetEncoding("label", kfold=1, out_dtype="float64")
    wf = Workflow(cats + conts + te + ["id"])
    wf.fit(ds)
    expected = wf.transform(ds).to_pandas().sort_values("id").reset_index(drop=True)

    wf.save(str(tmp_path / "wf"))
    assert (tmp_path / "wf" / "graph.json").exists()
    wf2 = Workflow.load(str(tmp_path / "wf"))
    got = wf2.transform(ds).to_pandas().sort_values("id").reset_index(drop=True)
    pd.testing.assert_frame_equal(expected, got[expected.columns])


def test_save_rejects_lambda(tmp_path, mixed_df):
    wf = Workflow(["x"] >> ops.LambdaOp(lambda s: s * 2)).fit(_ds(mixed_df))
    with pytest.raises(ValueError, match="named module-level"):
        wf.save(str(tmp_path / "bad"))


def test_resumable_transform(tmp_path):
    tdf = generate_transcripts_pandas(30, seed=42, max_turns=100)
    ds = _ds(tdf, 4)
    out_dir = str(tmp_path / "out")

    def build():
        lag = ["text_len"] >> ops.DifferenceLag(
            partition_cols="conv_id", shift=[1], sort_cols=["turn_idx"]
        )
        return Workflow(lag + ["conv_id", "turn_idx", "text"]).fit(ds)

    wf = build()
    manifest = wf.transform_resumable(ds, out_dir, ["conv_id"], num_buckets=8)
    assert len(manifest["completed"]) > 0
    files = sorted(f for f in os.listdir(out_dir) if f.endswith(".parquet"))
    assert files and all(f.startswith("part-") for f in files)
    lineage_files = os.listdir(os.path.join(out_dir, "_lineage"))
    assert len(lineage_files) == len(files)
    rec = json.load(open(os.path.join(out_dir, "_lineage", lineage_files[0])))
    assert {"bucket", "rows_in", "rows_out", "wall_ms", "op_chain_hash"} <= set(rec)

    full = pq.read_table(out_dir).to_pandas().sort_values(["conv_id", "turn_idx"])
    assert len(full) == len(tdf)
    # per-turn text equality survives the resumable writer
    o = tdf.sort_values(["conv_id", "turn_idx"])
    assert (full["text"].to_numpy() == o["text"].to_numpy()).all()

    # simulate a partial failure: drop two partitions + their lineage,
    # shrink the manifest; rerun must rewrite ONLY the missing buckets
    done = manifest["completed"]
    killed = done[:2]
    for b in killed:
        os.remove(os.path.join(out_dir, f"part-{b:05d}.parquet"))
        os.remove(os.path.join(out_dir, "_lineage", f"part-{b:05d}.json"))
    manifest["completed"] = [b for b in done if b not in killed]
    json.dump(manifest, open(os.path.join(out_dir, "_manifest.json"), "w"))

    mtimes = {
        f: os.path.getmtime(os.path.join(out_dir, f))
        for f in os.listdir(out_dir)
        if f.endswith(".parquet")
    }
    wf2 = build()
    manifest2 = wf2.transform_resumable(ds, out_dir, ["conv_id"], num_buckets=8)
    assert sorted(manifest2["completed"]) == sorted(done)
    for f, old_m in mtimes.items():
        assert os.path.getmtime(os.path.join(out_dir, f)) == old_m, f"{f} was rewritten"
    full2 = pq.read_table(out_dir).to_pandas()
    assert len(full2) == len(tdf)


def test_resume_invalidates_on_config_change(tmp_path):
    tdf = generate_transcripts_pandas(10, seed=42, max_turns=50)
    ds = _ds(tdf, 2)
    out_dir = str(tmp_path / "out2")
    wf = Workflow(
        (["text_len"] >> ops.DifferenceLag(partition_cols="conv_id", shift=[1], sort_cols=["turn_idx"]))
        + ["conv_id", "turn_idx"]
    ).fit(ds)
    m1 = wf.transform_resumable(ds, out_dir, ["conv_id"], num_buckets=4)
    wf2 = Workflow(
        (["text_len"] >> ops.DifferenceLag(partition_cols="conv_id", shift=[2], sort_cols=["turn_idx"]))
        + ["conv_id", "turn_idx"]
    ).fit(ds)
    m2 = wf2.transform_resumable(ds, out_dir, ["conv_id"], num_buckets=4)
    assert m2["op_chain_hash"] != m1["op_chain_hash"]  # fresh run, not resumed


def test_save_load_text_ops(tmp_path):
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from nvtabular_ray import Workflow, ops

    df = pd.DataFrame({"doc_id": [0, 1], "text": ["  A  B ", "x y x y x y"]})
    ds = rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False))
    wf = Workflow(
        (["text"] >> ops.TextClean() >> ops.TokenCount())
        + (["text"] >> ops.RepetitionRatio(ngram=2))
        + ["doc_id"]
    )
    wf.fit(ds)
    p = str(tmp_path / "wf")
    wf.save(p)
    from nvtabular_ray.state.artifacts import load_workflow

    wf2 = load_workflow(p)
    a = wf.transform(ds).to_pandas().sort_values("doc_id").reset_index(drop=True)
    b = wf2.transform(ds).to_pandas().sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_lineage_records_carry_counters(tmp_path):
    """SURVEY §7.5 counters: rows/bytes in+out, output null cells, and the
    Categorify OOV rate per partition."""
    import json
    import os

    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from nvtabular_ray import Workflow, ops

    df = pa.table({
        "user": pa.array([f"u{i % 4}" for i in range(40)]),
        "cat": pa.array((["a", "b"] * 19) + ["rare1", "rare2"]),
        "x": pa.array(np.arange(40, dtype=np.float64)),
    })
    ds = rd.from_arrow(df)
    wf = Workflow((["cat"] >> ops.Categorify(freq_threshold=5)) + ["user", "x"])
    wf.fit(ds)
    out_dir = str(tmp_path / "out")
    wf.transform_resumable(ds, out_dir, ["user"], num_buckets=4)
    recs = []
    for f in os.listdir(os.path.join(out_dir, "_lineage")):
        with open(os.path.join(out_dir, "_lineage", f)) as fh:
            recs.append(json.load(fh))
    assert recs
    tot_in = sum(r["rows_in"] for r in recs)
    assert tot_in == 40
    for r in recs:
        assert {"bytes_in", "bytes", "null_cells_out", "wall_ms"} <= set(r)
    # the two sub-threshold categories hash into the OOV slot somewhere
    assert sum(r.get("oov_rate_cat", 0) for r in recs) > 0


def test_save_load_context_and_rank(ray_session, tmp_path):
    import pyarrow as pa
    import ray.data as rd

    from nvtabular_ray import Workflow, ops
    from nvtabular_ray.state.artifacts import load_workflow

    t = pa.table({"e": ["a", "a", "b"], "i": [1, 2, 1], "txt": ["x", "y", "p"]})
    wf = Workflow(
        (["txt"] >> ops.ContextConcat(partition_cols="e", sort_cols=["i"], k=2, sep="|"))
        + (["i"] >> ops.GroupRank("e", ["i"], method="ntile", n=2, out_col="tile"))
        + ["e", "i"]
    )
    wf.fit(rd.from_arrow(t))
    wf.save(str(tmp_path / "wf"))
    wf2 = load_workflow(str(tmp_path / "wf"))
    a = wf.transform(t).to_pandas().sort_values(["e", "i"]).reset_index(drop=True)
    b = wf2.transform(t).to_pandas().sort_values(["e", "i"]).reset_index(drop=True)
    assert a.equals(b)
    assert a["txt_ctx2"].tolist() == [None, "x", None]
