"""JoinExternal: broadcast left/inner join against a small external table.

Reference: /root/reference/nvtabular/ops/join_external.py:35-221 — only
left/inner supported; optional column subset + dedup of the right side;
partition-wise broadcast merge (warns if the right side is large,
join_external.py:209-221). Input row ORDER is preserved (the reference
restores it via a temp arange, :157-163; our pandas left-merge on a unique
right side preserves left order already, and we assert uniqueness when
``drop_duplicates_ext`` is not set).

Ray design: the external table is loaded once on the driver, pushed to the
object store via ray.put (BroadcastTableState) and merged per batch inside
the map stage — the canonical broadcast-small-side join. For a large right
side use a real shuffle join (pipelines/joins) instead.
"""

from __future__ import annotations

from typing import Optional, Union

import pandas as pd
import pyarrow as pa

from nvtabular_ray.ops.base import BroadcastTableState, Operator


def _load_ext(df_ext) -> pa.Table:
    if isinstance(df_ext, pa.Table):
        return df_ext
    if isinstance(df_ext, pd.DataFrame):
        return pa.Table.from_pandas(df_ext, preserve_index=False)
    if isinstance(df_ext, str):
        import pyarrow.parquet as pq

        if df_ext.endswith(".csv"):
            import pyarrow.csv as pacsv

            return pacsv.read_csv(df_ext)
        return pq.read_table(df_ext)
    if hasattr(df_ext, "to_arrow_refs"):  # ray Dataset (must be small)
        import ray

        return pa.concat_tables(ray.get(df_ext.to_arrow_refs()))
    raise TypeError(f"unsupported external table type {type(df_ext)}")


class JoinExternal(BroadcastTableState, Operator):
    def __init__(
        self,
        df_ext,
        on: Union[str, list],
        how: str = "left",
        on_ext: Optional[Union[str, list]] = None,
        columns_ext: Optional[list[str]] = None,
        drop_duplicates_ext: bool = False,
    ):
        if how not in ("left", "inner", "semi", "anti"):
            raise ValueError(
                "how must be left/inner (reference parity) or semi/anti "
                "(new scope: existence filters against the broadcast table)"
            )
        self.on = [on] if isinstance(on, str) else list(on)
        self.on_ext = (
            self.on if on_ext is None else ([on_ext] if isinstance(on_ext, str) else list(on_ext))
        )
        self.how = how
        ext = _load_ext(df_ext)
        if columns_ext:
            ext = ext.select(columns_ext)
        if drop_duplicates_ext:
            df = ext.to_pandas().drop_duplicates(ignore_index=True)
            ext = pa.Table.from_pandas(df, preserve_index=False)
        elif how in ("left", "inner"):
            # the documented contract: without drop_duplicates_ext the join
            # key must be unique on the external side — a duplicate key
            # silently MULTIPLIES left rows (and desyncs any sibling branch)
            import pyarrow.compute as pc

            # null-safe distinct (multi-col keys with nulls would otherwise
            # over-count distinct rows and false-positive this guard)
            from nvtabular_ray.arrow_utils import null_safe_group_by

            n_distinct = null_safe_group_by(ext, self.on_ext, []).num_rows
            if n_distinct != ext.num_rows:
                raise ValueError(
                    f"external table has duplicate {self.on_ext} keys "
                    f"({ext.num_rows - n_distinct} extra rows); a left/inner "
                    "join would multiply input rows — pass "
                    "drop_duplicates_ext=True or deduplicate the table"
                )
        self.state_tables = {"ext": ext}
        self._ext_columns = list(ext.column_names)

    changes_row_count = True  # inner/semi/anti joins may drop rows

    def column_mapping(self, col_selector):
        if self.how in ("semi", "anti"):  # existence filter: left columns only
            return {c: [c] for c in col_selector.names}
        combined = dict.fromkeys(list(col_selector.names) + self._ext_columns)
        return {c: [c] for c in combined}

    def transform(self, col_selector, table: pa.Table) -> pa.Table:
        ext = self.state_pandas("ext")
        left = table.select(col_selector.names).to_pandas()
        if self.how in ("semi", "anti"):
            # vectorized existence mask against the (deduplicated) broadcast
            # keys; left row order and multiplicity preserved
            keys = ext[self.on_ext].drop_duplicates()
            keys.columns = self.on
            probe = left[self.on].merge(
                keys.assign(__hit__=True), on=self.on, how="left"
            )
            mask = probe["__hit__"].notna().to_numpy()
            out = left[mask if self.how == "semi" else ~mask]
            return pa.Table.from_pandas(out, preserve_index=False)
        merged = left.merge(
            ext, left_on=self.on, right_on=self.on_ext, how=self.how
        )
        return pa.Table.from_pandas(merged, preserve_index=False)
