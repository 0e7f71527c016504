"""Training-time batch iterator over a processed Dataset — the Ray-native
answer to the reference dataloaders (reference nvtabular/loader/torch.py:22-79
``TorchAsyncItr(dataset, cats, conts, labels, batch_size, shuffle,
parts_per_chunk, sparse_max, sparse_as_dense)``, backend semantics in
nvtabular/loader/backend.py).

Semantics kept from the reference:

- fixed ``batch_size`` with spillover across partitions (every batch is
  exactly ``batch_size`` rows until the final remainder; ``drop_last``
  drops it),
- buffered shuffling: the reference shuffles ``parts_per_chunk`` partitions
  at a time, NOT globally; the Ray analog is
  ``iter_batches(local_shuffle_buffer_size=...)`` — same locality/trade-off,
  no extra all-to-all pass over the epoch,
- grouped tensor layout: categorical columns stack into one int64 matrix,
  continuous into float32, labels into float32 (backend.py tensor groups),
- multi-hot (list) categoricals pad to ``sparse_max[col]`` with code 0 —
  the engine reserves 0 for padding (ops/categorify.py PAD_OFFSET), so
  padded positions can never collide with a real category.

Framework-agnostic core: batches are dicts of numpy arrays;
``framework="torch"`` / ``"tensorflow"`` converts per batch behind an
import-try (neither library ships in this container — the numpy path is the
tested contract, the conversion is a one-call wrapper).
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from nvtabular_ray.arrow_utils import as_single_chunk, is_list_type


def _pad_list_column(arr: pa.Array, max_len: int) -> np.ndarray:
    """(n, max_len) int64, padded with 0 (the engine's reserved pad code);
    sequences longer than ``max_len`` keep their LAST ``max_len`` codes
    (reference sparse_max truncation keeps the tail of the sequence)."""
    arr = as_single_chunk(arr)
    off = np.asarray(arr.offsets, dtype=np.int64)
    lens = np.diff(off)
    if arr.null_count:
        valid = arr.is_valid().to_numpy(zero_copy_only=False)
        lens = np.where(valid, lens, 0)  # null rows pad fully
    # index into the RAW child (arr.values) with the raw offsets — flatten()
    # compacts away null/sliced ranges and would desync the offset math.
    # Null child ELEMENTS first become the reserved pad code: to_numpy on a
    # nullable child yields float64 with NaN, and astype(int64) of NaN is
    # undefined garbage silently fed into training batches
    child = arr.values
    if child.null_count:
        child = pc.fill_null(child, 0)
    flat = np.asarray(child.to_numpy(zero_copy_only=False), dtype=np.int64)
    n = len(lens)
    out = np.zeros((n, max_len), dtype=np.int64)
    keep = np.minimum(lens, max_len)
    # gather the tail slice of each row: rows are contiguous in flat
    starts = off[:-1] + (lens - keep)
    total = int(keep.sum())
    if total:
        gather = (
            np.arange(total, dtype=np.int64)
            - np.repeat(np.concatenate([[0], np.cumsum(keep)[:-1]]), keep)
            + np.repeat(starts, keep)
        )
        rows = np.repeat(np.arange(n, dtype=np.int64), keep)
        cols = np.arange(total, dtype=np.int64) - np.repeat(
            np.concatenate([[0], np.cumsum(keep)[:-1]]), keep
        )
        out[rows, cols] = flat[gather]
    return out


class TrainLoader:
    """Iterate fixed-size training batches over a (processed) Dataset.

    Yields dicts: ``{"cats": int64 (B, n_scalar_cats), "conts": float32
    (B, n_conts), "labels": float32 (B, n_labels), "<list_col>": int64
    (B, sparse_max[col])}`` — list categoricals come as their own padded
    key each (the dense stack cannot hold ragged columns). Any group with
    no columns is omitted.

    Parameters mirror the reference loader: ``cats``/``conts``/``labels``
    column lists, ``batch_size``, ``shuffle`` + ``parts_per_chunk`` (buffer
    = ``batch_size * parts_per_chunk`` rows), ``seed`` for a deterministic
    epoch order, ``sparse_max`` {list_col: padded_len},
    ``framework=None|"torch"|"tensorflow"`` to convert each array per batch.
    """

    def __init__(
        self,
        ds,
        cats: Optional[list[str]] = None,
        conts: Optional[list[str]] = None,
        labels: Optional[list[str]] = None,
        batch_size: int = 1024,
        shuffle: bool = False,
        parts_per_chunk: int = 4,
        seed: Optional[int] = None,
        sparse_max: Optional[dict] = None,
        drop_last: bool = False,
        framework: Optional[str] = None,
    ):
        if framework not in (None, "torch", "tensorflow"):
            raise ValueError("framework must be None, 'torch' or 'tensorflow'")
        self.ds = ds
        self.cats = list(cats or [])
        self.conts = list(conts or [])
        self.labels = list(labels or [])
        self.batch_size = int(batch_size)
        self.shuffle = shuffle
        self.parts_per_chunk = int(parts_per_chunk)
        self.seed = seed
        self.sparse_max = dict(sparse_max or {})
        self.drop_last = drop_last
        self.framework = framework
        self._epoch = 0

        from nvtabular_ray.arrow_utils import dataset_arrow_schema

        schema = dataset_arrow_schema(ds)
        types = {f.name: f.type for f in schema}
        self._list_cats = [
            c for c in self.cats
            if isinstance(types.get(c), pa.DataType) and is_list_type(types[c])
        ]
        self._scalar_cats = [c for c in self.cats if c not in self._list_cats]
        for c in self._list_cats:
            if c not in self.sparse_max:
                raise ValueError(
                    f"list categorical {c!r} needs sparse_max[{c!r}] (padded length)"
                )

    def _convert(self, arr: np.ndarray):
        if self.framework == "torch":
            import torch  # gated: not in this container

            return torch.from_numpy(arr)
        if self.framework == "tensorflow":
            import tensorflow as tf  # gated

            return tf.convert_to_tensor(arr)
        return arr

    def __iter__(self):
        cols = self._scalar_cats + self._list_cats + self.conts + self.labels
        sel = self.ds.select_columns(cols)
        kw = dict(batch_size=self.batch_size, batch_format="pyarrow")
        if self.shuffle:
            kw["local_shuffle_buffer_size"] = self.batch_size * self.parts_per_chunk
            if self.seed is not None:
                # new epoch, new deterministic order
                kw["local_shuffle_seed"] = self.seed + self._epoch
        self._epoch += 1
        for t in sel.iter_batches(**kw):
            if self.drop_last and t.num_rows < self.batch_size:
                continue
            out = {}
            if self._scalar_cats:
                out["cats"] = self._convert(
                    np.column_stack(
                        [
                            as_single_chunk(t.column(c))
                            .to_numpy(zero_copy_only=False)
                            .astype(np.int64, copy=False)
                            for c in self._scalar_cats
                        ]
                    )
                )
            for c in self._list_cats:
                out[c] = self._convert(_pad_list_column(t.column(c), self.sparse_max[c]))
            if self.conts:
                out["conts"] = self._convert(
                    np.column_stack(
                        [
                            as_single_chunk(t.column(c))
                            .to_numpy(zero_copy_only=False)
                            .astype(np.float32, copy=False)
                            for c in self.conts
                        ]
                    )
                )
            if self.labels:
                out["labels"] = self._convert(
                    np.column_stack(
                        [
                            as_single_chunk(t.column(c))
                            .to_numpy(zero_copy_only=False)
                            .astype(np.float32, copy=False)
                            for c in self.labels
                        ]
                    )
                )
            yield out


# reference-compatible aliases (nvtabular/loader/torch.py:22, tensorflow.py)
def TorchAsyncItr(*args, **kwargs):
    kwargs.setdefault("framework", "torch")
    return TrainLoader(*args, **kwargs)


def KerasSequenceLoader(*args, **kwargs):
    kwargs.setdefault("framework", "tensorflow")
    return TrainLoader(*args, **kwargs)
