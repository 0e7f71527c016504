"""Actor-pool multimodal stages over opaque binary columns.

Schema convention: a modality column is ``{name}: binary`` plus typed
metadata columns ``{name}_mime: string``, ``{name}_meta: string(JSON)``.
Payloads are large -> stages default to SMALL batch sizes and pyarrow
batch_format (binary round-trips arrow fine, not pandas — ray_guide
pitfalls), with ``concurrency``/``num_cpus`` sized per stage.
"""

from __future__ import annotations

import json
from typing import Optional

import numpy as np
import pyarrow as pa


def _flat_binary(arr: pa.Array) -> tuple[np.ndarray, np.ndarray]:
    """(per-row int64 offsets rebased to 0, flat uint8 payload view) for a
    binary OR large_binary array — zero-copy and slice-offset-aware. The
    offsets buffer dtype follows the TYPE (large_binary = int64, binary =
    int32): reading int32 unconditionally would silently misparse a
    large_binary column into garbage. Only nullable arrays fall back to a
    concatenation (nulls read as b"")."""
    n = len(arr)
    if arr.null_count == 0 and len(arr.buffers()) == 3:
        off_dtype = np.int64 if pa.types.is_large_binary(arr.type) else np.int32
        off = np.frombuffer(arr.buffers()[1], dtype=off_dtype)[
            arr.offset : arr.offset + n + 1
        ].astype(np.int64)
        flat = np.frombuffer(arr.buffers()[2], dtype=np.uint8)[off[0] : off[-1]]
        return off - off[0], flat
    payloads = arr.to_pylist()
    lens = np.array([len(p or b"") for p in payloads], dtype=np.int64)
    off = np.concatenate([[0], np.cumsum(lens)])
    flat = (
        np.frombuffer(b"".join(p or b"" for p in payloads), dtype=np.uint8)
        if off[-1]
        else np.empty(0, np.uint8)
    )
    return off, flat


def attach_binary_column(ds, name: str, payload_fn=None, mime: str = "application/octet-stream"):
    """Attach a binary modality column (+metadata) to a Dataset. With no
    payload_fn a small deterministic fake payload is generated per row —
    enough to exercise batch sizing and decode plumbing in tests."""

    def add(t: pa.Table) -> pa.Table:
        n = t.num_rows
        if payload_fn is not None:
            payloads = [payload_fn(i) for i in range(n)]
        else:
            payloads = [bytes([i % 256]) * 64 for i in range(n)]
        t = t.append_column(name, pa.array(payloads, pa.binary()))
        t = t.append_column(f"{name}_mime", pa.array([mime] * n, pa.string()))
        t = t.append_column(
            f"{name}_meta",
            pa.array([json.dumps({"bytes": len(p)}) for p in payloads], pa.string()),
        )
        return t

    return ds.map_batches(add, batch_format="pyarrow", zero_copy_batch=True)


class DecodeImageStage:
    """Actor-pool image decode / resize / feature-extract stage.

    ``__init__`` (once per actor) is where codec/model state lives;
    ``__call__`` decodes each payload to a fixed-size feature vector.

    Two paths:

    - ``fake=True`` (default): deterministic byte-histogram stand-in —
      exercises the batch/actor plumbing on arbitrary payloads.
    - ``fake=False``: REAL decode via ``codecs.sniff_decode_image`` —
      pure stdlib+numpy PNG / BMP / PPM / PGM decoders (no external image
      library needed), then grayscale-resample features
      (``codecs.image_features``). Compressed formats beyond PNG (JPEG,
      WebP...) raise ValueError — stdlib has no DCT codec.
    """

    def __init__(self, column: str = "image", out_dim: int = 32, fake: bool = True):
        self.column = column
        self.out_dim = out_dim
        self.fake = fake

    def __call__(self, t: pa.Table) -> pa.Table:
        arr = t.column(self.column).combine_chunks()
        n, D = len(arr), self.out_dim
        if not self.fake:
            from nvtabular_ray.multimodal.codecs import (
                image_features,
                sniff_decode_image,
            )

            # decode is inherently per-payload; pixel math inside each call
            # is numpy, and the stage runs in an actor pool over small
            # batches (decode_images wiring).
            offsets, flat = _flat_binary(arr)
            feats = np.zeros((n, D), np.float32)
            fbytes = flat.tobytes()
            for i in range(n):
                payload = fbytes[offsets[i] : offsets[i + 1]]
                feats[i] = image_features(sniff_decode_image(payload), D)
            flat_feats = pa.array(feats.reshape(-1))
            col = pa.ListArray.from_arrays(
                pa.array(np.arange(n + 1, dtype=np.int32) * D, pa.int32()),
                flat_feats,
            )
            return t.drop_columns([self.column]).append_column(
                f"{self.column}_features", col
            )
        # zero-copy: all payload bytes as ONE uint8 view + per-row offsets
        # (dtype-aware for binary vs large_binary, slice-offset-aware)
        offsets, flat = _flat_binary(arr)
        lens = np.diff(offsets)
        row_idx = np.repeat(np.arange(n, dtype=np.int64), lens)
        # one bincount for the whole batch: histogram of byte%D per row
        h = np.bincount(row_idx * D + (flat % D), minlength=n * D).reshape(n, D)
        feats = (h / np.maximum(h.sum(axis=1, keepdims=True), 1)).astype(np.float32)
        flat_feats = pa.array(feats.reshape(-1))
        col = pa.ListArray.from_arrays(
            pa.array(np.arange(n + 1, dtype=np.int32) * D, pa.int32()),
            flat_feats,
        )
        return t.drop_columns([self.column]).append_column(f"{self.column}_features", col)


class FrameSampleStage:
    """Actor-pool video frame sampler: emits every k-th frame of the binary
    payload as its own row (flat_map shape).

    - ``fake=True`` (default): frames are fixed ``frame_bytes`` slices —
      plumbing exercise over arbitrary payloads.
    - ``fake=False``: REAL raw-video path — the payload is concatenated
      uncompressed frames (the standard decoded-tensor layout, e.g. rawvideo
      RGB24) whose geometry comes from the ``{column}_meta`` JSON column
      (``{"width": W, "height": H, "channels": C}``); frame size = W*H*C.
      Compressed containers (H.264 etc.) raise ValueError — no stdlib codec.
    """

    def __init__(self, column: str = "video", frame_bytes: int = 16, every_k: int = 4, fake: bool = True):
        self.column = column
        self.frame_bytes = frame_bytes
        self.every_k = every_k
        self.fake = fake

    def __call__(self, t: pa.Table) -> pa.Table:
        fb, k = self.frame_bytes, self.every_k
        if not self.fake:
            meta_col = f"{self.column}_meta"
            if meta_col not in t.column_names:
                raise ValueError(
                    f"real frame sampling needs a '{meta_col}' JSON column "
                    "with width/height/channels (raw concatenated frames); "
                    "compressed video would need a codec not in stdlib"
                )
            metas = [json.loads(m) for m in t.column(meta_col).to_pylist()]
            sizes = {
                (m["width"], m["height"], m.get("channels", 3)) for m in metas
            }
            if len(sizes) > 1:
                raise ValueError(
                    f"heterogeneous frame geometry in one batch: {sizes}; "
                    "partition by geometry upstream"
                )
            if sizes:
                w, h, c = next(iter(sizes))
                fb = w * h * c
        arr = t.column(self.column)
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        n = len(arr)
        # flat payload bytes + per-row offsets (dtype-aware for binary vs
        # large_binary, slice-offset-aware)
        off, flat = _flat_binary(arr)
        lens = np.diff(off)
        n_frames = lens // fb
        m = -(-n_frames // k)  # sampled frames per row (every k-th)
        total = int(m.sum())
        row_of = np.repeat(np.arange(n, dtype=np.int64), m)
        cum = np.concatenate([[0], np.cumsum(m)])
        j = np.arange(total, dtype=np.int64) - np.repeat(cum[:-1], m)
        frame_idx = j * k
        starts = off[:-1][row_of] + frame_idx * fb
        # ONE gather builds every frame: indices are starts broadcast + lane
        gather = starts[:, None] + np.arange(fb, dtype=np.int64)[None, :]
        frame_bytes = flat[gather.ravel()] if total else np.empty(0, np.uint8)
        if total * fb > np.iinfo(np.int32).max:
            # >2 GiB of sampled frame bytes in one batch: int32 offsets
            # wrap negative and from_buffers does not validate — emit
            # large_binary (int64 offsets) instead of corrupt slices
            frames = pa.LargeBinaryArray.from_buffers(
                pa.large_binary(),
                total,
                [
                    None,
                    pa.py_buffer((np.arange(total + 1, dtype=np.int64) * fb).tobytes()),
                    pa.py_buffer(frame_bytes.tobytes()),
                ],
            )
        else:
            frames = pa.BinaryArray.from_buffers(
                pa.binary(),
                total,
                [
                    None,
                    pa.py_buffer((np.arange(total + 1, dtype=np.int32) * fb).tobytes()),
                    pa.py_buffer(frame_bytes.tobytes()),
                ],
            )
        base = t.drop_columns([self.column])
        gathered = base.take(pa.array(row_of)) if total else base.slice(0, 0)
        gathered = gathered.append_column("frame_idx", pa.array(frame_idx.astype(np.int32)))
        gathered = gathered.append_column("frame", frames)
        return gathered


class DecodeAudioStage:
    """Actor-pool audio feature stage: decodes PCM WAV payloads (stdlib
    ``wave`` — REAL decode, no external library) into an ``out_dim``-frame
    windowed RMS-energy envelope. Non-WAV/compressed audio raises
    ValueError (no stdlib mp3/ogg codec)."""

    def __init__(self, column: str = "audio", out_dim: int = 16):
        self.column = column
        self.out_dim = out_dim

    def __call__(self, t: pa.Table) -> pa.Table:
        from nvtabular_ray.multimodal.codecs import audio_features

        arr = t.column(self.column).combine_chunks()
        n, D = len(arr), self.out_dim
        offsets, flat = _flat_binary(arr)
        fbytes = flat.tobytes()
        feats = np.zeros((n, D), np.float32)
        for i in range(n):
            feats[i] = audio_features(fbytes[offsets[i] : offsets[i + 1]], D)
        col = pa.ListArray.from_arrays(
            pa.array(np.arange(n + 1, dtype=np.int32) * D, pa.int32()),
            pa.array(feats.reshape(-1)),
        )
        return t.drop_columns([self.column]).append_column(
            f"{self.column}_features", col
        )


def decode_images(ds, column: str = "image", concurrency=(1, 4), batch_size: int = 256, **kw):
    """The canonical stateful multimodal stage wiring: callable CLASS + actor
    pool + small batches (large payloads). The pool autoscales from one
    actor — a fixed pool sized >= the cluster's CPUs would pre-reserve every
    core and starve the upstream read (deadlock on small nodes)."""
    return ds.map_batches(
        DecodeImageStage,
        fn_constructor_kwargs=dict(column=column, **kw),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )
