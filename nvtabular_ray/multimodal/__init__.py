"""Multimodal column plumbing: image/audio/video as opaque binary columns.

The decode/feature kernels themselves are STUBBED (no image/audio libs in
this environment — they raise NotImplementedError unless a deterministic
fake is requested), but the Ray-side plumbing is real and tested: schema
(binary payload + typed metadata), actor-pool map_batches stage shape,
batch sizing for large payloads, output layout.
"""

from nvtabular_ray.multimodal.stages import (
    DecodeImageStage,
    FrameSampleStage,
    attach_binary_column,
    decode_images,
)

__all__ = ["DecodeImageStage", "FrameSampleStage", "attach_binary_column", "decode_images"]
