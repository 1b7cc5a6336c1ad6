"""Hypothesis property tests for the pure-stdlib media codecs.

The PNG and WAV codecs (operators/multimodal.py) back the multimodal
query family; the fixed-seed roundtrips in test_png_codec.py pin the
spec corners, and these randomized properties sweep the shape space
(odd strides, 1-pixel images, extreme sample values, every channel
count) the fixed seeds can't enumerate. No Spark in the loop — the
codecs are plain functions over numpy arrays.
"""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings, strategies as st

from open_rust_timeseries_db_spark.operators.multimodal import (
    decode_audio,
    decode_image,
    encode_png,
    encode_wav,
)


@st.composite
def images(draw):
    h = draw(st.integers(min_value=1, max_value=24))
    w = draw(st.integers(min_value=1, max_value=24))
    c = draw(st.sampled_from([1, 2, 3, 4]))
    seed = draw(st.integers(min_value=0, max_value=2**31 - 1))
    return np.random.RandomState(seed).randint(
        0, 256, size=(h, w, c), dtype=np.uint8
    )


@settings(max_examples=60, deadline=None)
@given(images())
def test_png_roundtrip_any_shape(img):
    out = decode_image(encode_png(img))
    assert out.shape == img.shape
    assert np.array_equal(out, img)


@st.composite
def pcm(draw):
    frames = draw(st.integers(min_value=1, max_value=400))
    channels = draw(st.integers(min_value=1, max_value=6))
    bits = draw(st.sampled_from([8, 16]))
    rate = draw(st.sampled_from([8_000, 16_000, 44_100]))
    seed = draw(st.integers(min_value=0, max_value=2**31 - 1))
    rng = np.random.RandomState(seed)
    lo, hi = (-128, 128) if bits == 8 else (-(2**15), 2**15)
    samples = rng.randint(lo, hi, size=(frames, channels)).astype(np.int32)
    return samples, rate, bits


@settings(max_examples=60, deadline=None)
@given(pcm())
def test_wav_roundtrip_any_shape(case):
    samples, rate, bits = case
    out, out_rate = decode_audio(encode_wav(samples, rate, bits))
    assert out_rate == rate
    assert out.shape == samples.shape
    assert np.array_equal(out, samples)


@settings(max_examples=40, deadline=None)
@given(pcm())
def test_wav_mono_1d_input_equals_column(case):
    # encode_wav promotes 1-D input to one channel; the decoded column
    # must equal the original vector exactly.
    samples, rate, bits = case
    mono = samples[:, 0]
    out, _ = decode_audio(encode_wav(mono, rate, bits))
    assert out.shape == (len(mono), 1)
    assert np.array_equal(out[:, 0], mono)


@settings(max_examples=60, deadline=None)
@given(st.binary(min_size=0, max_size=64), st.sampled_from(["raw", "png", "wav"]))
def test_codecs_raise_only_valueerror_on_garbage(blob, prefix):
    # Corrupt payloads must raise ValueError (the Arrow operators turn
    # that into ok=false rows), never leak zlib/struct/numpy errors
    # that would fail a whole task at scale. Signature prefixes push
    # the fuzz past the magic-byte check into the chunk parsers.
    from open_rust_timeseries_db_spark.operators.multimodal import _PNG_SIG

    if prefix == "png":
        blob = _PNG_SIG + blob
    elif prefix == "wav":
        blob = b"RIFF\x10\x00\x00\x00WAVE" + blob
    for dec in (decode_image, decode_audio):
        try:
            dec(blob)
        except ValueError:
            pass


@settings(max_examples=60, deadline=None)
@given(images(), st.data())
def test_truncated_png_raises_valueerror(img, data):
    # Every prefix of a valid payload is either decodable or a clean
    # ValueError — this is the case that caught decode_image leaking
    # zlib.error on a cut IDAT stream.
    payload = encode_png(img)
    cut = data.draw(st.integers(min_value=0, max_value=len(payload) - 1))
    try:
        decode_image(payload[:cut])
    except ValueError:
        pass


@settings(max_examples=60, deadline=None)
@given(pcm(), st.data())
def test_truncated_wav_raises_valueerror_or_decodes(case, data):
    samples, rate, bits = case
    payload = encode_wav(samples, rate, bits)
    cut = data.draw(st.integers(min_value=0, max_value=len(payload) - 1))
    try:
        decode_audio(payload[:cut])
    except ValueError:
        pass
