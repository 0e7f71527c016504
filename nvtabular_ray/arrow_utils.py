"""Small Arrow helpers shared across ops."""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def hstack(tables: list[pa.Table]) -> pa.Table:
    """Column-concat tables (same row count); first occurrence wins on name
    collisions (mirrors the reference's addition-node column concat)."""
    if len(tables) == 1:
        return tables[0]
    n = tables[0].num_rows
    cols: dict[str, pa.ChunkedArray] = {}
    for t in tables:
        if t.num_rows != n:
            raise ValueError(
                f"cannot concat branches with different row counts ({t.num_rows} vs {n}); "
                "row-count-changing ops (Filter/Dropna) must run before branching"
            )
        for name in t.column_names:
            if name not in cols:
                cols[name] = t.column(name)
    return pa.table(cols)


def col_np(table: pa.Table, name: str) -> np.ndarray:
    """Column as numpy (copies when nulls present)."""
    return table.column(name).combine_chunks().to_numpy(zero_copy_only=False)


def as_single_chunk(arr) -> pa.Array:
    if isinstance(arr, pa.ChunkedArray):
        return arr.combine_chunks()
    return arr


def sort_table(table: pa.Table, keys: list[str], ascending: bool = True) -> pa.Table:
    order = "ascending" if ascending else "descending"
    return table.sort_by([(k, order) for k in keys])


def is_list_type(t: pa.DataType) -> bool:
    return pa.types.is_list(t) or pa.types.is_large_list(t)


def map_list_values(arr, fn) -> pa.Array:
    """Apply ``fn`` to the flattened values of a (large_)list array, keeping
    offsets — the Arrow analog of the reference's
    flatten_list_column_values/encode_list_column pattern
    (/root/reference/nvtabular/ops/normalize.py:75-88, logop.py:46-50)."""
    arr = as_single_chunk(arr)
    offsets = arr.offsets
    new_values = fn(arr.values)
    cls = pa.LargeListArray if pa.types.is_large_list(arr.type) else pa.ListArray
    if arr.null_count:
        # from_arrays without a mask drops the validity bitmap — NULL list
        # rows would silently come back as EMPTY lists
        import pyarrow.compute as pc

        return cls.from_arrays(offsets, new_values, mask=pc.is_null(arr))
    return cls.from_arrays(offsets, new_values)


def list_to_numpy_2d(arr, dtype=np.float64) -> np.ndarray:
    """(n, d) matrix from a fixed-width list<numeric> column WITHOUT a
    Python-object round trip: one flatten + one buffer-backed to_numpy +
    reshape. ``to_pylist()`` on a 1M x 64 embedding column allocates 64M
    Python floats — this is the per-row loop the scale rules forbid.

    Offsets are verified uniform (embedding columns are fixed-width by
    construction); ragged or null-bearing input falls back to the safe
    object path so correctness never depends on the fast layout."""
    arr = as_single_chunk(arr)
    n = len(arr)
    if n == 0:
        return np.empty((0, 0), dtype=dtype)
    if arr.null_count == 0:
        offs = np.asarray(arr.offsets, dtype=np.int64)
        lens = np.diff(offs)
        d = int(lens[0])
        if (lens == d).all():
            flat = arr.flatten().to_numpy(zero_copy_only=False)
            return np.ascontiguousarray(flat).astype(dtype, copy=False).reshape(n, d)
    return np.asarray(arr.to_pylist(), dtype=dtype)


def dataset_arrow_schema(ds) -> pa.Schema:
    """Dataset schema as a ``pa.Schema`` regardless of block format.

    ``ds.schema().base_schema`` is a ``pa.Schema`` for Arrow-backed
    datasets but a ``PandasBlockSchema`` (names + numpy dtypes) for
    ``from_pandas`` inputs; callers that do ``schema.field(col).type``
    crash on the latter. Convert via ``pa.from_numpy_dtype`` (object
    dtype — pandas strings — maps to ``pa.string()``)."""
    sch = ds.schema(fetch_if_missing=True)
    if sch is None:  # a zero-row plan can erase the schema entirely
        return None
    sch = getattr(sch, "base_schema", sch)
    if isinstance(sch, pa.Schema):
        return sch
    fields = []
    for name, typ in zip(sch.names, sch.types):
        if isinstance(typ, pa.DataType):
            fields.append(pa.field(name, typ))
            continue
        try:
            fields.append(pa.field(name, pa.from_numpy_dtype(typ)))
            continue
        except (pa.ArrowNotImplementedError, TypeError):
            pass
        # pandas EXTENSION dtypes (Int64Dtype, BooleanDtype, ...) are not
        # numpy dtypes; map through their numpy storage type — falling
        # straight to pa.string() here typed a nullable-Int64 column as
        # string and broke every downstream schema union on it
        npdt = getattr(typ, "numpy_dtype", None)
        if npdt is not None:
            try:
                fields.append(pa.field(name, pa.from_numpy_dtype(npdt)))
                continue
            except (pa.ArrowNotImplementedError, TypeError):
                pass
        fields.append(pa.field(name, pa.string()))
    return pa.schema(fields)


def apply_unary(arr, fn) -> pa.Array:
    """Apply an Array->Array kernel, transparently recursing into list columns."""
    arr = as_single_chunk(arr)
    if is_list_type(arr.type):
        return map_list_values(arr, fn)
    return fn(arr)


def null_safe_group_by(
    t: pa.Table,
    keys: list,
    aggs: list,
    use_threads: bool = False,
) -> pa.Table:
    """``t.group_by(keys).aggregate(aggs)`` that is correct when a key column
    contains nulls.

    pyarrow 16.1 has an upstream bug: MULTI-key ``Table.group_by`` where one
    key column contains nulls emits ~one duplicate null-key group per 32-row
    internal mini-batch (repro: 666 rows, keys (string-with-nulls, int64) ->
    64 groups instead of 12). Single-key grouping with nulls and null-free
    multi-key grouping are both correct, so this helper short-circuits to a
    plain group_by for those shapes. Otherwise each nullable key column is
    null-filled with an arbitrary in-type value and paired with an int8
    validity column that joins the group keys — the validity key keeps a real
    value that equals the fill sentinel in a distinct group from true nulls —
    then nulls are restored and the validity columns dropped, so output
    schema and column order match the plain call exactly.

    The reference engines get null-as-first-class-group semantics for free
    from pandas/cuDF groupby(dropna=False)
    (/root/reference/nvtabular/ops/categorify.py:52-55)."""
    keys = list(keys)
    gb = lambda tab, ks: tab.group_by(ks, use_threads=use_threads).aggregate(aggs)  # noqa: E731
    if len(keys) <= 1:
        return gb(t, keys)
    nullable = [k for k in keys if t.column(k).null_count > 0]
    if not nullable:
        return gb(t, keys)
    import pyarrow.compute as pc

    work = t
    restore = []  # (key, validity_name, orig_type, all_null)
    for k in nullable:
        col = work.column(k)
        vname = f"__nsgb_valid_{k}__"
        idx = work.schema.get_field_index(k)
        valid = pc.is_valid(col).combine_chunks()
        dn = col.drop_null()
        if len(dn) == 0:
            # all-null key: any constant column groups identically; int8
            # zeros avoid needing a scalar of an arbitrary type
            work = work.set_column(
                idx, k, pa.array(np.zeros(work.num_rows, dtype=np.int8))
            )
            restore.append((k, vname, col.type, True))
        else:
            work = work.set_column(idx, k, pc.fill_null(col, dn[0]))
            restore.append((k, vname, col.type, False))
        work = work.append_column(vname, valid)
    res = gb(work, keys + [v for _, v, _, _ in restore])
    for k, vname, orig_type, all_null in restore:
        idx = res.schema.get_field_index(k)
        if all_null:
            res = res.set_column(
                idx, k, pa.nulls(res.num_rows, type=orig_type)
            )
        else:
            col = res.column(k)
            res = res.set_column(
                idx,
                k,
                pc.if_else(res.column(vname), col, pa.scalar(None, type=col.type)),
            )
    return res.drop_columns([v for _, v, _, _ in restore])


def null_safe_merge_keys(t: pa.Table, keys: list) -> tuple:
    """Append null-safe equi-join key columns for ``keys`` and return
    ``(table, merge_keys)``.

    Pandas ``merge`` on nullable keys is a trap twice over: an all-null
    object key column round-trips through ``groupby().reset_index()`` as
    float64 NaN (dtype-mismatch ValueError against the object side), and
    None-vs-NaN equivalence inside object-key hashtables is version
    folklore. Columns with nulls get a ``(fill, validity int8)`` pair —
    same encoding as :func:`null_safe_group_by`, exact for any fill value
    because validity disambiguates — so every merge key is non-null and
    dtype-stable. Null-free key columns are passed through untouched.
    Callers must drop the appended ``__mk_/__mv_`` columns from output."""
    import pyarrow.compute as pc

    merge_keys = []
    for k in keys:
        col = as_single_chunk(t.column(k))
        if col.null_count == 0:
            merge_keys.append(k)
            continue
        vname, fname = f"__mv_{k}__", f"__mk_{k}__"
        valid = pc.is_valid(col).cast(pa.int8())
        dn = col.drop_null()
        if len(dn) == 0:
            filled = pa.array(np.zeros(t.num_rows, dtype=np.int8))
        else:
            filled = pc.fill_null(col, dn[0])
        t = t.append_column(fname, filled).append_column(vname, valid)
        merge_keys += [fname, vname]
    return t, merge_keys


def pruned_projection(ds, cols: list):
    """``select_columns`` that actually prunes the parquet READ.

    Ray 2.49's ``Project`` is not pushed down into ``ReadParquet``: on a
    37M-row table with one wide text column, ``read_parquet(p).select_columns
    (["text_len"])`` decodes every column (4.3 s) while ``read_parquet(p,
    columns=["text_len"])`` reads one (0.9 s). Workflow.fit projects each
    stat op's input this way, so every fit was silently paying the full-width
    decode. When ``ds`` is a bare un-executed ``read_parquet`` over plain
    paths with no extra read options, re-issue the read with ``columns=``;
    any other plan (maps applied, custom filesystem/datasource, already
    executed) falls back to plain ``select_columns``."""
    cols = list(cols)
    try:
        dag = ds._logical_plan.dag
        if type(dag).__name__ == "Read" and not dag.input_dependencies:
            dsrc = getattr(dag, "_datasource", None)
            if type(dsrc).__name__ == "ParquetDatasource" and _plain_parquet_read(dsrc):
                have = getattr(dsrc, "_data_columns", None)
                paths = getattr(dsrc, "_unresolved_paths", None)
                subset = have is None or set(cols) <= set(have)
                if paths is not None and subset and set(cols) != set(have or ()):
                    import ray.data as rd

                    return rd.read_parquet(paths, columns=cols)
    except Exception:
        pass
    return ds.select_columns(cols)


def _plain_parquet_read(dsrc) -> bool:
    """True only when re-issuing ``read_parquet(paths, columns=...)`` is
    provably equivalent to the captured datasource: every read option the
    user could have passed must be at its default. A filtered read
    (``filter=``), custom schema/filesystem/partitioning, block_udf,
    include_paths or file shuffle re-issued without those options would
    feed SILENTLY WRONG data to every stat fit (round-4 advice: the old
    guard checked only columns/paths and dropped ``filter=``)."""
    if getattr(dsrc, "_to_batches_kwargs", None):
        return False  # filter=, batch_size=, ... would be dropped
    for attr in ("_block_udf", "_read_schema", "_file_metadata_shuffler"):
        if getattr(dsrc, attr, None) is not None:
            return False
    if getattr(dsrc, "_include_paths", False):
        return False
    if getattr(dsrc, "_partition_columns", None):
        return False
    fs = getattr(dsrc, "_filesystem", None)
    # local paths re-resolve to the identical LocalFileSystem; any other
    # (S3, GCS, wrapped/custom) may carry credentials or behavior the
    # re-issued read would lose — fall back to select_columns
    if fs is not None and type(fs).__name__ != "LocalFileSystem":
        return False
    part = getattr(dsrc, "_partitioning", None)
    if part is not None and not (
        getattr(part, "style", None) == "hive"
        and not getattr(part, "base_dir", None)
        and not getattr(part, "field_names", None)
        and not getattr(part, "field_types", None)
    ):
        return False
    return True
