"""Flagship transcript feature pipeline (north-star workload).

One Workflow over the transcript table (conv_id, turn_idx, role, text, tool,
ts, text_len, latency) producing, per turn:

- Categorify(role, tool)                       (vocab broadcast, null->1)
- TE_role_text_len                             (out-of-fold target encoding)
- text_len_norm                                (log1p + z-score)
- text_len_difference_lag_{1,-1}               (per-conv lag/lead)
- session_id                                   (gap-based sessionization)
- text_len_w600s_{count,mean}                  (trailing 10-min window)

All ordered features share ONE bucketed conv_id shuffle (the workflow
compiler fuses partitioned ops); stat fits are map_batches partials + small
groupby shuffles. Per-turn text is carried through untouched — the per-turn
text-equality invariant holds under (conv_id, turn_idx) ordering.
"""

from __future__ import annotations

from nvtabular_ray import ops
from nvtabular_ray.workflow import Workflow

PASSTHROUGH = ["conv_id", "turn_idx", "ts", "text"]


def transcript_feature_workflow(passthrough=PASSTHROUGH) -> Workflow:
    cats = ["role", "tool"] >> ops.Categorify()
    te = ["role"] >> ops.TargetEncoding(
        "text_len", kfold=3, fold_on=["conv_id", "turn_idx"]
    )
    conts = ["text_len"] >> ops.LogOp() >> ops.Normalize() >> ops.Rename(postfix="_norm")
    lag = ["text_len"] >> ops.DifferenceLag(
        partition_cols="conv_id", shift=[1, -1], sort_cols=["turn_idx"]
    )
    sess = ["ts"] >> ops.Sessionize(partition_cols="conv_id", ts_col="ts", gap=300)
    roll = ["text_len"] >> ops.RollingAgg(
        partition_cols="conv_id", ts_col="ts", window_seconds=600, aggs=("count", "mean")
    )
    return Workflow(cats + te + conts + lag + sess + roll + list(passthrough))


def transcript_features(
    ds,
    num_buckets=None,
    project_exchange: bool = False,
    hot_threshold: int | None = None,
    target_seg_rows: int = 250_000,
):
    """fit + transform; returns (feature Dataset, fitted Workflow).

    ``project_exchange=True`` is the SURVEY §7.4.7 payload-projection
    variant: the wide ``text`` column bypasses the SORTING conv_id exchange
    (only the consumed narrow columns ride it) and re-attaches afterwards
    with a non-sorting co-bucketed 1:1 join on the unique (conv_id,
    turn_idx) key — ordered-exchange payload drops to the narrow columns
    and the bucket sort never gather-copies text. Total bytes moved stay
    the same (text crosses the wire once either way), so whether it wins
    wall-clock depends on text width; see BASELINE.md for the measured
    comparison on the bench table (~200-char texts).

    ``hot_threshold=<rows>`` is the SKEW-ROBUST plan: conversations above
    the threshold are split into ~``target_seg_rows`` time segments
    (pipelines/hot_split.py — exact via halo replication + carry folding)
    instead of landing whole in one exchange bucket, so per-task memory
    and the straggler are capped regardless of the hottest conversation's
    size. The stat ops (Categorify / TargetEncoding / Normalize) are
    per-row after fit and run as a plain fused ``map_batches`` BEFORE the
    ordered exchange; output columns are identical to the default plan
    (pytest-pinned)."""
    if hot_threshold is not None:
        from nvtabular_ray.pipelines.hot_split import ordered_features

        # only the per-row branches of the flagship DAG; the ordered ops
        # are re-expressed as hot-split specs below
        rowwise = Workflow(
            (["role", "tool"] >> ops.Categorify())
            + (["role"] >> ops.TargetEncoding(
                "text_len", kfold=3, fold_on=["conv_id", "turn_idx"]
            ))
            + (["text_len"] >> ops.LogOp() >> ops.Normalize() >> ops.Rename(postfix="_norm"))
            + (list(PASSTHROUGH) + ["text_len"])
        )
        rowwise.fit(ds)
        flat = rowwise.transform(ds)  # no ordered ops -> pure map_batches
        specs = [
            {"kind": "lag", "col": "text_len", "shift": 1},
            {"kind": "lag", "col": "text_len", "shift": -1},
            {"kind": "sessionize", "gap": 300, "out": "session_id"},
            {"kind": "rolling", "col": "text_len", "window": 600,
             "aggs": ["count", "mean"]},
        ]
        out = ordered_features(
            flat, "conv_id", "ts", specs,
            hot_threshold=hot_threshold, target_seg_rows=target_seg_rows,
            num_buckets=num_buckets, sort_cols=["turn_idx"],
            # analyze on the RAW input (pruned parquet read of conv_id+ts);
            # analyzing `flat` would re-execute the rowwise transform twice
            analyze_ds=ds,
        )
        return out.drop_columns(["text_len"]), rowwise

    if not project_exchange:
        wf = transcript_feature_workflow()
        wf.fit(ds)
        return wf.transform(ds, num_buckets=num_buckets), wf

    from nvtabular_ray.pipelines.partitioned import rejoin_by_key

    wf = transcript_feature_workflow(passthrough=["conv_id", "turn_idx", "ts"])
    wf.fit(ds)
    feats = wf.transform(ds, num_buckets=num_buckets)
    wide = ds.select_columns(["conv_id", "turn_idx", "text"])
    out = rejoin_by_key(feats, wide, keys=["conv_id", "turn_idx"], num_buckets=num_buckets)
    return out, wf
