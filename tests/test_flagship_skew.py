"""transcript_features(hot_threshold=...) — the skew-robust flagship plan —
must produce exactly the default plan's columns and values (the ordered ops
re-expressed as hot-split specs, stat ops fused per-row)."""

import numpy as np
import pandas as pd

from nvtabular_ray.pipelines.transcripts import transcript_features
from nvtabular_ray.transcripts import generate_transcripts


def _to_df(out) -> pd.DataFrame:
    df = out.to_pandas()
    return df.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)


def test_skew_plan_matches_default(ray_session):
    ds = generate_transcripts(300, seed=11).materialize()
    base, _ = transcript_features(ds)
    # threshold/segment sizes chosen so the zipf-long conversations are
    # actually torn into multiple segments
    skew, _ = transcript_features(ds, hot_threshold=60, target_seg_rows=50)

    a, b = _to_df(base), _to_df(skew)
    assert len(a) == len(b) > 0
    assert set(a.columns) == set(b.columns)
    assert (a["text"].to_numpy() == b["text"].to_numpy()).all()
    for c in a.columns:
        if c in ("conv_id", "text", "ts"):
            continue
        x = a[c].to_numpy(dtype=np.float64, na_value=np.nan)
        y = b[c].to_numpy(dtype=np.float64, na_value=np.nan)
        np.testing.assert_allclose(x, y, rtol=1e-6, atol=1e-8, equal_nan=True,
                                   err_msg=f"column {c}")
