"""Deterministic synthetic multi-turn transcript generator (FIXTURES.md F1).

Schema per BASELINE.json input_hint:
  conv_id:string, turn_idx:int32, role:string, text:string, tool:string(nullable),
  ts:timestamp[us]  (+ derived text_len:int32, latency:float64)

Properties the tests/bench depend on:
- fully deterministic per (seed, conv_id) regardless of partitioning
  (per-conv counter-based RNG), so any scale can be regenerated shard-wise;
- turns-per-conv is zipf(a)-skewed and clamped — exercises hot-key handling;
- ts strictly increasing in turn_idx within a conv (as-of/leakage tests);
- text is a pure function of (conv_id, turn_idx) — the per-turn
  text-equality invariant.

Generation is itself a Ray Data pipeline: ``range(num_convs)`` ->
``map_batches`` (one task per conv shard), so a 10^12-turn table is produced
distributed, never on the driver.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

_ROLES = np.array(["user", "assistant", "tool"])
_TOOLS = np.array([f"tool_{chr(97 + i)}" for i in range(20)])
_WORDS = np.array(
    "the quick brown fox jumps over lazy dog alpha beta gamma delta "
    "query answer token stream batch shuffle arrow actor lineage".split()
)
_EPOCH = np.datetime64("2024-01-01T00:00:00", "us")


def conv_table(conv_idx: int, seed: int = 42, max_turns: int = 10_000, zipf_a: float = 1.5) -> dict:
    """Columns for one conversation; deterministic in (seed, conv_idx)."""
    rng = np.random.default_rng([seed, conv_idx])
    n = int(min(max(rng.zipf(zipf_a), 1), max_turns))
    turn_idx = np.arange(n, dtype=np.int32)
    conv_id = f"conv_{conv_idx:08d}"

    role = _ROLES[(turn_idx + int(rng.integers(0, 3))) % 3]
    # ~30% null tools, zipf-ish tool popularity
    tool_ix = rng.integers(0, 40, n)
    tool = np.where(tool_ix < 20, _TOOLS[np.minimum(tool_ix, 19)], None)

    deltas = rng.integers(1, 600, n).astype("int64")  # strictly positive => monotone ts
    start = int(rng.integers(0, 86_400 * 365)) * 1_000_000
    ts = _EPOCH + (start + np.cumsum(deltas) * 1_000_000).astype("timedelta64[us]")

    w = rng.integers(0, len(_WORDS), (n, 6))
    words = _WORDS[w]
    text = np.array(
        [f"{conv_id}:{t}:" + " ".join(words[i]) for i, t in enumerate(turn_idx)], dtype=object
    )
    text_len = np.array([len(s) for s in text], dtype=np.int32)
    latency = deltas.astype("float64")
    latency[0] = np.nan

    return {
        "conv_id": np.repeat(conv_id, n),
        "turn_idx": turn_idx,
        "role": role,
        "text": text,
        "tool": tool,
        "ts": ts,
        "text_len": text_len,
        "latency": latency,
    }


def _convs_to_table(conv_indices: np.ndarray, seed: int, max_turns: int, zipf_a: float) -> pa.Table:
    parts = [conv_table(int(i), seed, max_turns, zipf_a) for i in conv_indices]
    cols = {}
    for name in parts[0]:
        cols[name] = np.concatenate([p[name] for p in parts])
    df = pd.DataFrame(cols)
    schema = pa.schema(
        [
            ("conv_id", pa.string()),
            ("turn_idx", pa.int32()),
            ("role", pa.string()),
            ("text", pa.string()),
            ("tool", pa.string()),
            ("ts", pa.timestamp("us")),
            ("text_len", pa.int32()),
            ("latency", pa.float64()),
        ]
    )
    return pa.Table.from_pandas(df, schema=schema, preserve_index=False)


def generate_transcripts(
    num_convs: int,
    seed: int = 42,
    max_turns: int = 10_000,
    zipf_a: float = 1.5,
    override_num_blocks: int | None = None,
):
    """Distributed deterministic transcript Dataset (lazy)."""
    import ray.data as rd

    blocks = override_num_blocks or max(8, num_convs // 512)
    ds = rd.range(num_convs, override_num_blocks=min(blocks, num_convs))

    def gen(batch) -> pa.Table:
        return _convs_to_table(np.asarray(batch["id"]), seed, max_turns, zipf_a)

    return ds.map_batches(gen, batch_format="numpy")


def generate_transcripts_pandas(num_convs: int, seed: int = 42, max_turns: int = 10_000, zipf_a: float = 1.5) -> pd.DataFrame:
    """Driver-side small-scale variant for unit tests / oracles."""
    return _convs_to_table(np.arange(num_convs), seed, max_turns, zipf_a).to_pandas()
