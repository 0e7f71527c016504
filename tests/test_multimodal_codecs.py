"""Real multimodal decode: pure stdlib+numpy codecs (PNG/BMP/PPM/WAV) and
the fake=False stage paths over Ray datasets."""

import json
import struct
import zlib

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from nvtabular_ray.multimodal import (
    DecodeAudioStage,
    DecodeImageStage,
    FrameSampleStage,
    attach_binary_column,
)
from nvtabular_ray.multimodal.codecs import (
    audio_features,
    decode_bmp,
    decode_png,
    decode_ppm,
    decode_wav,
    encode_bmp,
    encode_png,
    encode_ppm,
    encode_wav,
    image_features,
    sniff_decode_image,
)

rng = np.random.default_rng(7)


@pytest.mark.parametrize("shape", [(5, 7, 3), (4, 4, 4), (3, 9, 1), (1, 1, 3)])
def test_png_roundtrip(shape):
    img = rng.integers(0, 256, shape, dtype=np.uint8)
    np.testing.assert_array_equal(decode_png(encode_png(img)), img)


def _png_with_filters(img: np.ndarray, filters: list[int]) -> bytes:
    """Encode a PNG applying a CHOSEN filter to each scanline (per the spec's
    forward-filter definitions) — exercises every defilter branch."""
    h, w, c = img.shape
    stride = w * c
    flat = img.reshape(h, stride).astype(np.int32)
    out = bytearray()
    for y in range(h):
        f = filters[y]
        cur = flat[y]
        prev = flat[y - 1] if y else np.zeros(stride, np.int32)
        left = np.concatenate([np.zeros(c, np.int32), cur[:-c]])
        ul = np.concatenate([np.zeros(c, np.int32), prev[:-c]])
        if f == 0:
            filt = cur
        elif f == 1:
            filt = cur - left
        elif f == 2:
            filt = cur - prev
        elif f == 3:
            filt = cur - ((left + prev) >> 1)
        else:  # Paeth
            p = left + prev - ul
            pa_, pb, pc = np.abs(p - left), np.abs(p - prev), np.abs(p - ul)
            pred = np.where(
                (pa_ <= pb) & (pa_ <= pc), left, np.where(pb <= pc, prev, ul)
            )
            filt = cur - pred
        out.append(f)
        out.extend((filt & 0xFF).astype(np.uint8).tobytes())

    def chunk(ctype, body):
        return (
            struct.pack(">I", len(body))
            + ctype
            + body
            + struct.pack(">I", zlib.crc32(ctype + body))
        )

    color = {1: 0, 2: 4, 3: 2, 4: 6}[c]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(out)))
        + chunk(b"IEND", b"")
    )


@pytest.mark.parametrize("c", [1, 3, 4])
def test_png_all_filter_types(c):
    img = rng.integers(0, 256, (6, 5, c), dtype=np.uint8)
    data = _png_with_filters(img, [0, 1, 2, 3, 4, 4])
    np.testing.assert_array_equal(decode_png(data), img)


def test_png_rejects_unsupported():
    img = rng.integers(0, 256, (2, 2, 3), dtype=np.uint8)
    data = bytearray(encode_png(img))
    data[24] = 16  # bit depth byte inside IHDR
    with pytest.raises(ValueError, match="bit depth"):
        decode_png(bytes(data))
    with pytest.raises(ValueError, match="signature"):
        decode_png(b"JUNKJUNKJUNK")


@pytest.mark.parametrize("w", [4, 5, 6, 7])  # exercises BMP 4-byte row padding
def test_bmp_roundtrip(w):
    img = rng.integers(0, 256, (3, w, 3), dtype=np.uint8)
    np.testing.assert_array_equal(decode_bmp(encode_bmp(img)), img)


@pytest.mark.parametrize("c", [1, 3])
def test_ppm_roundtrip(c):
    img = rng.integers(0, 256, (4, 6, c), dtype=np.uint8)
    np.testing.assert_array_equal(decode_ppm(encode_ppm(img)), img)


def test_ppm_header_comments():
    img = rng.integers(0, 256, (2, 3, 3), dtype=np.uint8)
    data = b"P6\n# a comment\n3 2\n# another\n255\n" + img.tobytes()
    np.testing.assert_array_equal(decode_ppm(data), img)


def test_sniff_dispatch():
    img = rng.integers(0, 256, (3, 3, 3), dtype=np.uint8)
    for enc in (encode_png, encode_bmp, encode_ppm):
        np.testing.assert_array_equal(sniff_decode_image(enc(img)), img)
    with pytest.raises(ValueError, match="unrecognized"):
        sniff_decode_image(b"\xff\xd8\xff\xe0 jpeg-ish")


def test_wav_roundtrip_and_features():
    t = np.arange(8000)
    sig = (10000 * np.sin(2 * np.pi * 440 * t / 16000)).astype(np.int16)
    data = encode_wav(sig, rate=16000)
    back, rate = decode_wav(data)
    assert rate == 16000
    np.testing.assert_array_equal(back[:, 0], sig)
    # constant-amplitude sine -> flat RMS envelope at amp/sqrt(2)/32768
    env = audio_features(data, 8)
    assert env.shape == (8,)
    np.testing.assert_allclose(env, 10000 / np.sqrt(2) / 32768.0, rtol=0.02)


def test_image_features_deterministic():
    img = np.zeros((8, 8, 3), np.uint8)
    img[4:, :, :] = 255  # bottom half white
    v = image_features(img, 16)  # 4x4 grid: rows 0-1 black, rows 2-3 white
    np.testing.assert_allclose(v.reshape(4, 4)[:2], 0.0)
    np.testing.assert_allclose(v.reshape(4, 4)[2:], 1.0)


def test_decode_image_stage_real_path(ray_session):
    imgs = [rng.integers(0, 256, (6, 6, 3), dtype=np.uint8) for _ in range(10)]
    encs = [encode_png, encode_bmp, encode_ppm]
    # payload_fn indexes are batch-local -> one block so they equal row ids
    base = rd.range(10).repartition(1)
    ds = attach_binary_column(
        base, "image", payload_fn=lambda i: encs[i % 3](imgs[i]), mime="image/mixed"
    )
    out = ds.map_batches(
        DecodeImageStage,
        fn_constructor_kwargs=dict(column="image", out_dim=16, fake=False),
        batch_format="pyarrow",
        concurrency=2,
    ).to_pandas()
    assert len(out) == 10
    got = {int(r["id"]): np.asarray(r["image_features"]) for _, r in out.iterrows()}
    for i in range(10):
        np.testing.assert_allclose(got[i], image_features(imgs[i], 16), atol=1e-7)


def test_decode_audio_stage(ray_session):
    sigs = [
        (int(3000 * (i + 1)) * np.ones(4000)).astype(np.int16) for i in range(6)
    ]
    ds = attach_binary_column(
        rd.range(6).repartition(1),
        "audio",
        payload_fn=lambda i: encode_wav(sigs[i]),
        mime="audio/wav",
    )
    out = ds.map_batches(
        DecodeAudioStage,
        fn_constructor_kwargs=dict(column="audio", out_dim=4),
        batch_format="pyarrow",
        concurrency=2,
    ).to_pandas()
    got = {int(r["id"]): np.asarray(r["audio_features"]) for _, r in out.iterrows()}
    for i in range(6):
        np.testing.assert_allclose(got[i], 3000 * (i + 1) / 32768.0, rtol=1e-4)


def test_frame_sampler_real_rawvideo():
    w, h, c, nframes = 4, 3, 3, 7
    frames = rng.integers(0, 256, (nframes, h, w, c), dtype=np.uint8)
    payload = frames.tobytes()
    t = pa.table(
        {
            "vid": pa.array([0], pa.int64()),
            "video": pa.array([payload], pa.binary()),
            "video_meta": pa.array(
                [json.dumps({"width": w, "height": h, "channels": c})], pa.string()
            ),
        }
    )
    out = FrameSampleStage("video", every_k=2, fake=False)(t)
    idx = out["frame_idx"].to_pylist()
    assert idx == [0, 2, 4, 6]
    for j, fi in enumerate(idx):
        assert out["frame"][j].as_py() == frames[fi].tobytes()


def test_frame_sampler_real_requires_meta():
    t = pa.table({"video": pa.array([b"xx"], pa.binary())})
    with pytest.raises(ValueError, match="video_meta"):
        FrameSampleStage("video", fake=False)(t)
