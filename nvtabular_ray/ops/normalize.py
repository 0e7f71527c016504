"""Normalize (z-score) and NormalizeMinMax stat ops.

Reference: /root/reference/nvtabular/ops/normalize.py:33-212.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from nvtabular_ray.arrow_utils import apply_unary
from nvtabular_ray.ops.base import StatOperator
from nvtabular_ray.ops.moments import column_moments


class Normalize(StatOperator):
    output_tags = ["continuous"]

    """Z-score with fitted mean/std (ddof=1); std==0 -> centering only
    (reference normalize.py:79-82); list columns normalized on flattened
    values; out dtype float64 by default (normalize.py:121-124)."""

    def __init__(self, out_dtype=None):
        super().__init__()
        self.means: dict[str, float] = {}
        self.stds: dict[str, float] = {}
        self.out_dtype = out_dtype or "float64"

    def fit(self, col_selector, ds) -> None:
        stats = column_moments(ds, col_selector.names)
        for col, st in stats.items():
            self.means[col] = st["mean"]
            self.stds[col] = st["std"]

    def fit_partials(self, col_selector, ds):
        from nvtabular_ray.ops.base import FitPlan
        from nvtabular_ray.ops.moments import (
            MOMENTS_KEYS,
            MOMENTS_SPEC,
            _partials_batch,
            finalize_moments,
        )

        cols = list(col_selector.names)

        def finalize(df):
            for col, st in finalize_moments(df).items():
                self.means[col] = st["mean"]
                self.stds[col] = st["std"]

        return [
            FitPlan(lambda t: _partials_batch(t, cols), MOMENTS_KEYS, MOMENTS_SPEC, finalize)
        ]

    def clear(self):
        super().clear()
        self.means, self.stds = {}, {}

    def output_dtype(self):
        return pa.from_numpy_dtype(self.out_dtype)

    def transform(self, col_selector, table: pa.Table) -> pa.Table:
        out_type = pa.from_numpy_dtype(self.out_dtype)
        cols = {}
        for name in col_selector.names:
            mean, std = self.means[name], self.stds[name]

            def kernel(a, mean=mean, std=std):
                a = pc.cast(a, pa.float64())
                a = pc.subtract(a, pa.scalar(mean, pa.float64()))
                if std > 0:
                    a = pc.divide(a, pa.scalar(std, pa.float64()))
                return pc.cast(a, out_type)

            cols[name] = apply_unary(table.column(name), kernel)
        return pa.table(cols)


class NormalizeMinMax(StatOperator):
    output_tags = ["continuous"]

    """Scale to [0,1] from fitted min/max; dif==0 -> x/(2x)
    (reference normalize.py:155-160). Out float64 default."""

    def __init__(self, out_dtype=None):
        super().__init__()
        self.mins: dict[str, float] = {}
        self.maxs: dict[str, float] = {}
        self.out_dtype = out_dtype or "float64"

    def fit(self, col_selector, ds) -> None:
        stats = column_moments(ds, col_selector.names)
        for col, st in stats.items():
            self.mins[col] = st["min"]
            self.maxs[col] = st["max"]

    def fit_partials(self, col_selector, ds):
        from nvtabular_ray.ops.base import FitPlan
        from nvtabular_ray.ops.moments import (
            MOMENTS_KEYS,
            MOMENTS_SPEC,
            _partials_batch,
            finalize_moments,
        )

        cols = list(col_selector.names)

        def finalize(df):
            for col, st in finalize_moments(df).items():
                self.mins[col] = st["min"]
                self.maxs[col] = st["max"]

        return [
            FitPlan(lambda t: _partials_batch(t, cols), MOMENTS_KEYS, MOMENTS_SPEC, finalize)
        ]

    def clear(self):
        super().clear()
        self.mins, self.maxs = {}, {}

    def output_dtype(self):
        return pa.from_numpy_dtype(self.out_dtype)

    def transform(self, col_selector, table: pa.Table) -> pa.Table:
        out_type = pa.from_numpy_dtype(self.out_dtype)
        cols = {}
        for name in col_selector.names:
            mn, mx = self.mins[name], self.maxs[name]
            dif = mx - mn

            def kernel(a, mn=mn, dif=dif):
                a = pc.cast(a, pa.float64())
                if dif > 0:
                    a = pc.divide(pc.subtract(a, pa.scalar(mn, pa.float64())), pa.scalar(dif, pa.float64()))
                else:
                    # reference normalize.py:158-160: when max==min, x / (2*x)
                    a = pc.divide(a, pc.multiply(a, pa.scalar(2.0, pa.float64())))
                return pc.cast(a, out_type)

            cols[name] = apply_unary(table.column(name), kernel)
        return pa.table(cols)


class NormalizeRobust(StatOperator):
    output_tags = ["continuous"]

    """Robust scaler: ``(x - median) / (q_high - q_low)`` with fitted EXACT
    interpolated quantiles (defaults 0.25/0.75 — the classic median/IQR
    scaler, outlier-insensitive where Normalize's mean/std is not). No
    reference analog (nearest is Normalize, reference normalize.py:79-124).
    IQR == 0 -> centering only (Normalize's std==0 convention). Quantiles
    come from the streaming histogram-refine engine (functions/quantile.py)
    — all three targets refined in the same dataset passes — so results
    match a DuckDB ``quantile_cont`` oracle exactly. No fused fit_partials:
    quantile refinement is iterative (its own few scan rounds), unlike the
    one-pass moment partials."""

    def __init__(self, q_low: float = 0.25, q_high: float = 0.75, out_dtype=None):
        super().__init__()
        if not (0.0 <= q_low < q_high <= 1.0):
            raise ValueError("need 0 <= q_low < q_high <= 1")
        self.q_low = float(q_low)
        self.q_high = float(q_high)
        self.medians: dict[str, float] = {}
        self.iqrs: dict[str, float] = {}
        self.out_dtype = out_dtype or "float64"

    def fit(self, col_selector, ds) -> None:
        from nvtabular_ray.functions.quantile import distributed_quantiles_multi

        qs = distributed_quantiles_multi(
            ds, list(col_selector.names), [self.q_low, 0.5, self.q_high]
        )
        for col, (lo, med, hi) in qs.items():
            self.medians[col] = med
            self.iqrs[col] = hi - lo

    def clear(self):
        super().clear()
        self.medians, self.iqrs = {}, {}

    def output_dtype(self):
        return pa.from_numpy_dtype(self.out_dtype)

    def transform(self, col_selector, table: pa.Table) -> pa.Table:
        out_type = pa.from_numpy_dtype(self.out_dtype)
        cols = {}
        for name in col_selector.names:
            med, iqr = self.medians[name], self.iqrs[name]

            def kernel(a, med=med, iqr=iqr):
                a = pc.cast(a, pa.float64())
                a = pc.subtract(a, pa.scalar(med, pa.float64()))
                if iqr > 0:
                    a = pc.divide(a, pa.scalar(iqr, pa.float64()))
                return pc.cast(a, out_type)

            cols[name] = apply_unary(table.column(name), kernel)
        return pa.table(cols)
