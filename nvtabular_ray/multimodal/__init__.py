"""Multimodal column plumbing: image/audio/video as opaque binary columns.

Schema convention: binary payload + typed metadata columns; stages are
actor-pool ``map_batches`` with small batches (large payloads).

Decode paths (``codecs.py``, pure stdlib+numpy — REAL, not stubbed):
PNG (zlib inflate + numpy defilter), BMP (BI_RGB), PPM/PGM, PCM WAV
(stdlib ``wave``), raw-video concatenated frames (geometry from the
``_meta`` JSON). Formats needing codecs absent from the stdlib (JPEG,
mp3, H.264) raise ValueError — that boundary is the only stub left.
A deterministic fake path (``fake=True``) remains for plumbing tests on
arbitrary payloads.
"""

from nvtabular_ray.multimodal.stages import (
    DecodeAudioStage,
    DecodeImageStage,
    FrameSampleStage,
    attach_binary_column,
    decode_images,
)

__all__ = [
    "DecodeAudioStage",
    "DecodeImageStage",
    "FrameSampleStage",
    "attach_binary_column",
    "decode_images",
]
