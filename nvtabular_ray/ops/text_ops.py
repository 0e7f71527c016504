"""Workflow-DSL wrappers over the corpus text kernels (functions/text.py),
so text cleaning / scoring composes with the feature-engineering ops:

    wf = Workflow((["text"] >> TextClean() >> TokenCount()) + ["doc_id"])

New scope vs the reference (its only string function is str.len,
/root/reference/nvtabular/ops/data_stats.py:79); op-contract style follows
the reference operator model (batch-local transform, declared output
dtypes)."""

from __future__ import annotations

import pyarrow as pa

from nvtabular_ray.ops.base import Operator


class TextClean(Operator):
    """In-place normalization of each selected string column: control chars
    -> space, whitespace collapsed, trimmed, lowercased."""

    def output_dtype(self):
        return pa.string()

    def transform(self, col_selector, table: pa.Table) -> pa.Table:
        from nvtabular_ray.functions.text import clean_array

        return pa.table({n: clean_array(table.column(n)) for n in col_selector.names})


class PIIRedact(Operator):
    """In-place PII scrubbing of each selected string column (emails ->
    <EMAIL>, IPv4 -> <IP>, phones -> <PHONE>)."""

    def output_dtype(self):
        return pa.string()

    def transform(self, col_selector, table: pa.Table) -> pa.Table:
        from nvtabular_ray.functions.text import redact_array

        return pa.table(
            {n: redact_array(table.column(n))[0] for n in col_selector.names}
        )


class TokenCount(Operator):
    """col -> col_tokens: BPE-ish token count (words + punctuation marks)."""

    def column_mapping(self, col_selector):
        return {f"{n}_tokens": [n] for n in col_selector.names}

    def output_dtype(self):
        return pa.int64()

    def transform(self, col_selector, table: pa.Table) -> pa.Table:
        from nvtabular_ray.functions.text import _count_re

        return pa.table(
            {
                f"{n}_tokens": pa.array(_count_re(table.column(n), r"\w+|[^\w\s]"))
                for n in col_selector.names
            }
        )


class RepetitionRatio(Operator):
    """col -> col_rep_ratio: duplicate word-n-gram fraction per row
    (Gopher-style repetition signal; see functions.text.repetition_ratios)."""

    def __init__(self, ngram: int = 2):
        self.ngram = ngram

    def column_mapping(self, col_selector):
        return {f"{n}_rep_ratio": [n] for n in col_selector.names}

    def output_dtype(self):
        return pa.float64()

    def transform(self, col_selector, table: pa.Table) -> pa.Table:
        from nvtabular_ray.functions.text import repetition_ratios

        return pa.table(
            {
                f"{n}_rep_ratio": pa.array(
                    repetition_ratios(table.column(n), ngram=self.ngram)
                )
                for n in col_selector.names
            }
        )
