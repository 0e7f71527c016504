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


def shard_by_token_budget(ds, budget: int, size_col: str, order_col: str,
                          out_col: str = "shard_id"):
    """Assign every row a CONTIGUOUS shard id in ``order_col`` order such
    that a new shard starts each time the running token total crosses a
    ``budget`` boundary: shard = floor(exclusive-prefix-sum / budget).
    The length-balanced-output step for training-shard writes (each shard
    holds ~budget tokens; a shard may overrun by at most one row's tail
    since rows are never split — chunk oversized rows upstream).

    Distributed plan — a textbook two-pass parallel prefix scan, because a
    global ordered cumsum is the one shape ``map_batches`` cannot express
    (every block needs the total of all earlier blocks):

    1. probe pass: one tiny task per block returns (token sum, first/last
       key, in-block-sortedness). When the blocks are ALREADY globally
       sorted by ``order_col`` — the common case: a corpus written in key
       order by an upstream stage — the probe doubles as pass 1 and the
       range-sort stage is SKIPPED entirely (at 100 TB the sort is the only
       all-to-all in this operator). Null keys or any disorder fall back to
       ``Dataset.sort`` over the already-materialized blocks (upstream maps
       are never re-executed), followed by a fresh sum pass,
    2. the driver computes exclusive block offsets from O(blocks) ints,
    3. pass 2: one task per block adds its offset to a block-local
       exclusive cumsum; floor-divide by budget is the shard id.

    Nothing but per-block int64 sums and boundary keys ever reaches the
    driver, every pass is embarrassingly parallel, and the output is a
    Dataset over the same blocks (``from_arrow_refs`` — zero re-shuffle)."""
    import ray as _ray
    import ray.data as rd

    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    refs = ds.to_arrow_refs()
    if not refs:
        return ds.map_batches(
            lambda t: t.append_column(out_col, pa.array([], pa.int64())),
            batch_format="pyarrow",
        )

    def _block_sizes_sum(t: pa.Table) -> int:
        col = t.column(size_col)
        if col.null_count:
            import pyarrow.compute as pc

            col = pc.fill_null(col, 0)
        return int(np.sum(np.asarray(col, dtype=np.int64))) if t.num_rows else 0

    @_ray.remote(num_cpus=0.25)
    def block_probe(t: pa.Table) -> tuple:
        """(sum, first_key, last_key, in_block_sorted, n)."""
        import pyarrow.compute as pc

        n = t.num_rows
        if n == 0:
            return (0, None, None, True, 0)
        s = _block_sizes_sum(t)
        k = t.column(order_col)
        kc = k.combine_chunks() if isinstance(k, pa.ChunkedArray) else k
        if kc.null_count:  # null keys have no defined order: force the sort
            return (s, None, None, False, n)
        ordered = (
            bool(pc.all(pc.greater_equal(kc.slice(1), kc.slice(0, n - 1))).as_py())
            if n > 1
            else True
        )
        return (s, kc[0].as_py(), kc[n - 1].as_py(), ordered, n)

    probes = _ray.get([block_probe.remote(r) for r in refs])
    ok = all(p[3] for p in probes)
    if ok:  # blocks internally sorted; check they are also non-overlapping
        last = None
        for p in probes:
            if p[4] == 0:
                continue
            if last is not None and p[1] < last:
                ok = False
                break
            last = p[2]
    if ok:
        sums = [p[0] for p in probes]
    else:
        block_sum = _ray.remote(num_cpus=0.25)(_block_sizes_sum)
        refs = rd.from_arrow_refs(refs).sort(order_col).to_arrow_refs()
        sums = _ray.get([block_sum.remote(r) for r in refs])
    offsets = np.concatenate([[0], np.cumsum(sums[:-1], dtype=np.int64)])

    @_ray.remote(num_cpus=0.25)
    def stamp(t: pa.Table, offset: int) -> pa.Table:
        if t.num_rows == 0:
            return t.append_column(out_col, pa.array([], pa.int64()))
        col = t.column(size_col)
        if col.null_count:
            import pyarrow.compute as pc

            col = pc.fill_null(col, 0)
        sizes = np.asarray(col, dtype=np.int64)
        # exclusive prefix: the row's START offset decides its shard
        before = offset + np.concatenate([[0], np.cumsum(sizes[:-1], dtype=np.int64)])
        return t.append_column(out_col, pa.array(before // budget, pa.int64()))

    return rd.from_arrow_refs(
        [stamp.remote(r, int(o)) for r, o in zip(refs, offsets)]
    )
