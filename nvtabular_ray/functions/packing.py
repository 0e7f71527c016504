"""Sequence packing: group variable-length documents into training bins of
at most ``capacity`` tokens (the standard "packing" step that keeps LLM
training batches dense instead of padding every sequence to max length).

Ray-native plan: packing is partition-local (first-fit-decreasing inside
each batch) — the streaming-friendly formulation. A global optimum needs
all sizes in one place; per-block FFD is the textbook approximation (≤
11/9·OPT + 1 bins) and keeps the op embarrassingly parallel: no shuffle,
no driver state, deterministic for a given block partitioning. Bin ids are
globally unique without coordination: a bin is named by the smallest item
id it contains (item ids are unique, bins are disjoint).

Oversized items (size > capacity) get a singleton bin rather than an
error — at 100 TB a handful of pathological rows must not kill the job;
filter or chunk them upstream (functions/text.chunk_documents).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def pack_bins_ffd(sizes: np.ndarray, capacity: int) -> np.ndarray:
    """First-fit-decreasing over one block -> bin index per item (local).

    The assignment loop is per-ITEM over (id,size) pairs — narrow rows that
    exist only inside this kernel; best-fit via searchsorted on a sorted
    remaining-capacity array keeps it O(n log n)."""
    n = len(sizes)
    order = np.argsort(-sizes, kind="stable")
    bin_of = np.empty(n, dtype=np.int64)
    rems: list[int] = []  # kept sorted ascending
    rem_bin: list[int] = []
    import bisect

    nbins = 0
    for i in order:
        s = int(sizes[i])
        j = bisect.bisect_left(rems, s)
        if j < len(rems):  # tightest bin that fits (best-fit-decreasing)
            b = rem_bin.pop(j)
            r = rems.pop(j) - s
        else:
            b = nbins
            nbins += 1
            r = max(capacity - s, 0)
        bin_of[i] = b
        k = bisect.bisect_left(rems, r)
        rems.insert(k, r)
        rem_bin.insert(k, b)
    return bin_of


def pack_sequences(ds, size_col: str, id_col: str, capacity: int):
    """Append ``bin_id`` (= min item id in the bin) and ``bin_fill`` (total
    size packed into that bin) to every row; no shuffle, no global state."""

    def f(t: pa.Table) -> pa.Table:
        sizes = np.asarray(t.column(size_col), dtype=np.int64)
        ids = np.asarray(t.column(id_col), dtype=np.int64)
        local = pack_bins_ffd(sizes, capacity)
        nbins = int(local.max()) + 1 if len(local) else 0
        big = np.iinfo(np.int64).max
        min_id = np.full(nbins, big, dtype=np.int64)
        np.minimum.at(min_id, local, ids)
        fill = np.zeros(nbins, dtype=np.int64)
        np.add.at(fill, local, sizes)
        t = t.append_column("bin_id", pa.array(min_id[local]))
        return t.append_column("bin_fill", pa.array(fill[local]))

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)
