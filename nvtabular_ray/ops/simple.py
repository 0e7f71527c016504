"""Stateless per-batch ops: FillMissing, Clip, LogOp, Bucketize, Rename,
Filter, Dropna, LambdaOp.

All are vectorized Arrow kernels inside ``map_batches`` — no per-row Python.
Reference semantics cited per class.
"""

from __future__ import annotations

from typing import Callable, Optional, Union

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from nvtabular_ray.arrow_utils import apply_unary, as_single_chunk
from nvtabular_ray.ops.base import Operator
from nvtabular_ray.selector import ColumnSelector


class FillMissing(Operator):
    """Constant fill + optional ``{col}_filled`` bool indicator.

    Reference: /root/reference/nvtabular/ops/fill.py:23-80 (fill_val default 0,
    add_binary_cols adds isna() flags).
    """

    def __init__(self, fill_val=0, add_binary_cols: bool = False):
        self.fill_val = fill_val
        self.add_binary_cols = add_binary_cols

    def column_mapping(self, col_selector):
        mapping = {name: [name] for name in col_selector.names}
        if self.add_binary_cols:
            for name in col_selector.names:
                mapping[f"{name}_filled"] = [name]
        return mapping

    def compute_output_schema(self, col_selector, input_schema):
        out = {n: input_schema.get(n) for n in col_selector.names}
        if self.add_binary_cols:
            for n in col_selector.names:
                out[f"{n}_filled"] = pa.bool_()
        return out

    def transform(self, col_selector, table: pa.Table) -> pa.Table:
        cols = {}
        for name in col_selector.names:
            arr = table.column(name)
            if self.add_binary_cols:
                cols[f"{name}_filled"] = pc.is_null(arr, nan_is_null=True)
            fill = pa.scalar(self.fill_val, type=arr.type) if not pa.types.is_floating(arr.type) else pa.scalar(float(self.fill_val), type=arr.type)
            filled = pc.fill_null(arr, fill)
            if pa.types.is_floating(arr.type):
                # NaN counts as missing too (pandas .fillna semantics)
                filled = pc.if_else(pc.is_nan(filled), fill, filled)
            cols[name] = filled
        ordered = {}
        for name in col_selector.names:
            ordered[name] = cols[name]
            if self.add_binary_cols:
                ordered[f"{name}_filled"] = cols[f"{name}_filled"]
        return pa.table(ordered)


class Clip(Operator):
    """Clamp to [min_value, max_value].
    Reference: /root/reference/nvtabular/ops/clip.py:21-57."""

    def __init__(self, min_value=None, max_value=None):
        if min_value is None and max_value is None:
            raise ValueError("Clip needs min_value and/or max_value")
        self.min_value = min_value
        self.max_value = max_value

    def transform(self, col_selector, table: pa.Table) -> pa.Table:
        def kernel(a):
            if self.min_value is not None:
                a = pc.max_element_wise(a, pa.scalar(self.min_value, type=a.type))
            if self.max_value is not None:
                a = pc.min_element_wise(a, pa.scalar(self.max_value, type=a.type))
            return a

        return pa.table(
            {n: apply_unary(table.column(n), kernel) for n in col_selector.names}
        )


class LogOp(Operator):
    """log(1+x) as float32, list columns supported.
    Reference: /root/reference/nvtabular/ops/logop.py:29-63."""

    output_tags = ["continuous"]

    def output_dtype(self):
        return pa.float32()

    def transform(self, col_selector, table: pa.Table) -> pa.Table:
        def kernel(a):
            # ln at float64 precision, float32 only on the OUTPUT — matches
            # the reference (log at input dtype, downcast result) and avoids
            # 1-ulp float32-ln divergence from SQL engines
            a = pc.cast(a, pa.float64())
            return pc.cast(pc.ln(pc.add(a, pa.scalar(1.0, pa.float64()))), pa.float32())

        return pa.table(
            {n: apply_unary(table.column(n), kernel) for n in col_selector.names}
        )


class Bucketize(Operator):
    """Continuous -> bin index via np.digitize(right=False); out int32.
    Reference: /root/reference/nvtabular/ops/bucketize.py:24-104.

    Null/NaN inputs land in the TOP bucket — deliberate reference parity
    (np.digitize over the raw values, bucketize.py:81-92: NaN sorts after
    every boundary). Use FillMissing upstream, or QuantileBucketize, when
    missing values must stay null."""

    def __init__(self, boundaries: Union[list, dict]):
        if isinstance(boundaries, (list, tuple)):
            self._lookup = {None: list(boundaries)}
        elif isinstance(boundaries, dict):
            self._lookup = dict(boundaries)
        else:
            raise TypeError("boundaries must be list or dict")

    def _bounds(self, col):
        return self._lookup.get(col, self._lookup.get(None))

    def output_dtype(self):
        return pa.int32()

    def transform(self, col_selector, table: pa.Table) -> pa.Table:
        cols = {}
        for name in col_selector.names:
            vals = as_single_chunk(table.column(name)).to_numpy(zero_copy_only=False)
            binned = np.digitize(vals, np.asarray(self._bounds(name)), right=False)
            cols[name] = pa.array(binned.astype(np.int32))
        return pa.table(cols)


class Rename(Operator):
    """Rename via callable / postfix / fixed name.
    Reference: /root/reference/nvtabular/ops/rename.py:20-78."""

    def __init__(self, f: Optional[Callable] = None, postfix: Optional[str] = None, name: Optional[str] = None):
        if not any([f, postfix, name]):
            raise ValueError("Rename needs f, postfix or name")
        self.f = f
        self.postfix = postfix
        self.name = name

    def _new_name(self, col: str, n_cols: int) -> str:
        if self.f:
            return self.f(col)
        if self.postfix:
            return col + self.postfix
        if n_cols > 1:
            raise RuntimeError("Single name to Rename but multiple columns selected")
        return self.name

    def column_mapping(self, col_selector):
        names = col_selector.names
        return {self._new_name(c, len(names)): [c] for c in names}

    def transform(self, col_selector, table: pa.Table) -> pa.Table:
        names = col_selector.names
        return pa.table({self._new_name(c, len(names)): table.column(c) for c in names})


class Filter(Operator):
    """Row filter from a user callable returning a boolean mask or a filtered
    table. Reference: /root/reference/nvtabular/ops/filter.py:28-64.

    The callable receives the selected columns as a pyarrow.Table (use
    pyarrow.compute) — vectorized, unlike per-row ``ds.filter``.
    """

    changes_row_count = True

    def __init__(self, f: Callable):
        self.f = f

    def transform(self, col_selector, table: pa.Table) -> pa.Table:
        selected = table.select(col_selector.names)
        result = self.f(selected)
        if isinstance(result, pa.Table):
            return result
        if isinstance(result, (pa.Array, pa.ChunkedArray)):
            return selected.filter(result)
        if isinstance(result, np.ndarray):
            return selected.filter(pa.array(result))
        raise TypeError("Filter callable must return a mask or a pa.Table")


class Dropna(Operator):
    """Drop rows with nulls in the selected columns.
    Reference: /root/reference/nvtabular/ops/dropna.py:21-39."""

    changes_row_count = True

    def transform(self, col_selector, table: pa.Table) -> pa.Table:
        selected = table.select(col_selector.names)
        return selected.drop_null()


class LambdaOp(Operator):
    """User function applied per selected column — the primary extension
    surface. Reference: /root/reference/nvtabular/ops/lambdaop.py:19-51.

    ``backend`` picks what ``f`` receives:

    - ``"auto"`` (default): try the zero-copy pyarrow Array ONCE; if ``f``
      raises TypeError/AttributeError/NotImplementedError on it (e.g. it
      uses Series methods or operators Arrow lacks), permanently fall back
      to a pandas Series for this op. Arrow-friendly fns skip the
      Arrow->pandas->Arrow round-trip every batch paid under the old
      pandas-only default.
    - ``"pyarrow"`` / ``"pandas"``: force one path (reference parity is
      ``"pandas"`` — ``f`` sees a Series).
    """

    def compute_output_schema(self, col_selector, input_schema):
        # arbitrary user fn: only a declared dtype is trustworthy
        d = pa.from_numpy_dtype(np.dtype(self.dtype)) if self.dtype is not None else None
        return {n: d for n in col_selector.names}

    def __init__(self, f: Callable, dtype=None, label: Optional[str] = None, backend: str = "auto"):
        if backend not in ("auto", "pyarrow", "pandas"):
            raise ValueError("backend must be 'auto', 'pyarrow' or 'pandas'")
        self.f = f
        self.dtype = dtype
        self._label = label
        self.backend = backend
        self._resolved_backend = backend if backend != "auto" else None

    def _via_pandas(self, arr: pa.Array):
        import pandas as pd

        out = self.f(arr.to_pandas())
        if not isinstance(out, pd.Series):
            out = pd.Series(out)
        return pa.Array.from_pandas(out)

    def _apply(self, arr: pa.Array):
        backend = self._resolved_backend
        if backend == "pandas":
            return self._via_pandas(arr)
        if backend == "pyarrow":
            out = self.f(arr)
            return pa.array(out) if isinstance(out, np.ndarray) else out
        # auto: probe arrow once, remember the verdict for every later batch
        try:
            out = self.f(arr)
            if isinstance(out, np.ndarray):
                out = pa.array(out)
            if not isinstance(out, (pa.Array, pa.ChunkedArray)):
                raise TypeError("fn did not return an array on the arrow path")
            self._resolved_backend = "pyarrow"
            return out
        except (TypeError, AttributeError, NotImplementedError, pa.ArrowInvalid):
            self._resolved_backend = "pandas"
            return self._via_pandas(arr)

    def transform(self, col_selector, table: pa.Table) -> pa.Table:
        cols = {}
        for name in col_selector.names:
            out = self._apply(as_single_chunk(table.column(name)))
            if self.dtype is not None:
                out = pc.cast(out, pa.from_numpy_dtype(np.dtype(self.dtype)))
            cols[name] = out
        return pa.table(cols)

    @property
    def label(self):
        return self._label or f"LambdaOp({getattr(self.f, '__name__', 'fn')})"
