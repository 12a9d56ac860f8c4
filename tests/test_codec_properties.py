"""Property tests for the pure-Python container codecs (PPM, WAV) —
all driver-side (no Spark plans), so hypothesis @given is cheap here
(the repo's convention of seeded loops applies only where each example
would compile a Spark plan).

Two property families per codec:
- roundtrip: encode -> parse is the identity over randomized dims,
  rasters, comments, whitespace and terminators;
- fuzz totality: the parser's ONLY failure mode on arbitrary or
  corrupted bytes is ValueError (the kernels wrap that with the
  offending media_id) — never IndexError / struct.error / silent
  garbage, which would surface as opaque executor crashes at 100 TB.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from tiny_md_hbase_spark.operators.multimodal import (
    _parse_ppm,
    _parse_ppm_at,
    _parse_wav,
    make_ppm,
    make_wav,
)

# comment bytes must avoid the comment terminators (a \n or \r inside a
# comment ENDS it early by spec — roundtrip identity then doesn't hold)
_COMMENT_BYTE = st.integers(32, 126).map(lambda c: bytes([c]))
_COMMENT = st.lists(_COMMENT_BYTE, max_size=12).map(b"".join)
_WS = st.sampled_from([b"\n", b" ", b"\t", b"\r\n", b"\x0b", b"\x0c"])


@st.composite
def ppm_image(draw):
    w = draw(st.integers(0, 17))
    h = draw(st.integers(0, 13))
    rgb = bytes(
        draw(
            st.lists(
                st.integers(0, 255), min_size=w * h * 3, max_size=w * h * 3
            )
        )
    )
    comments = draw(st.lists(_COMMENT, max_size=3)) or None
    ws = draw(_WS)
    end = draw(st.sampled_from([b"\n", b"\r"]))
    return w, h, rgb, make_ppm(w, h, rgb, comments, ws, end)


@settings(max_examples=80, deadline=None)
@given(ppm_image())
def test_ppm_roundtrip_property(img):
    w, h, rgb, payload = img
    assert _parse_ppm(payload) == (w, h, rgb)


@settings(max_examples=80, deadline=None)
@given(st.lists(ppm_image(), min_size=1, max_size=5))
def test_ppm_stream_walk_property(imgs):
    buf = b"".join(p for _, _, _, p in imgs)
    pos = 0
    for w, h, rgb, p in imgs:
        pw, ph, off, end = _parse_ppm_at(buf, pos)
        assert (pw, ph) == (w, h)
        assert buf[off:end] == rgb
        assert buf[pos:end] == p
        pos = end
    assert pos == len(buf)


@settings(max_examples=150, deadline=None)
@given(st.binary(max_size=200))
def test_ppm_fuzz_only_valueerror(data):
    try:
        _parse_ppm(data)
    except ValueError:
        pass


@settings(max_examples=100, deadline=None)
@given(ppm_image(), st.data())
def test_ppm_corruption_only_valueerror(img, data):
    """Mutating or truncating a VALID container never escapes the
    ValueError contract (it may still parse — e.g. a raster byte flip
    parses fine with different pixels; that is correct)."""
    _, _, _, payload = img
    if not payload:
        return
    if data.draw(st.booleans(), label="truncate"):
        cut = data.draw(st.integers(0, len(payload)), label="cut")
        mutated = payload[:cut]
    else:
        i = data.draw(st.integers(0, len(payload) - 1), label="pos")
        b = data.draw(st.integers(0, 255), label="byte")
        mutated = payload[:i] + bytes([b]) + payload[i + 1 :]
    try:
        _parse_ppm(mutated)
    except ValueError:
        pass


@st.composite
def wav_file(draw):
    channels = draw(st.integers(1, 3))
    frames = draw(st.integers(0, 40))
    samples = draw(
        st.lists(
            st.integers(-32768, 32767),
            min_size=frames * channels,
            max_size=frames * channels,
        )
    )
    rate = draw(st.sampled_from([8000, 16000, 22050, 44100]))
    pre = None
    if draw(st.booleans()):
        body = bytes(draw(st.lists(st.integers(0, 255), max_size=9)))
        pre = [(b"LIST", body)]
    return rate, channels, samples, make_wav(samples, rate, channels, pre)


@settings(max_examples=80, deadline=None)
@given(wav_file())
def test_wav_roundtrip_property(wav):
    import numpy as np

    rate, channels, samples, payload = wav
    got_rate, got_ch, data = _parse_wav(payload)
    assert (got_rate, got_ch) == (rate, channels)
    assert np.frombuffer(data, dtype="<i2").tolist() == samples


@settings(max_examples=150, deadline=None)
@given(st.binary(max_size=200))
def test_wav_fuzz_only_valueerror(data):
    try:
        _parse_wav(data)
    except ValueError:
        pass


@settings(max_examples=100, deadline=None)
@given(wav_file(), st.data())
def test_wav_corruption_only_valueerror(wav, data):
    _, _, _, payload = wav
    if data.draw(st.booleans(), label="truncate"):
        cut = data.draw(st.integers(0, len(payload)), label="cut")
        mutated = payload[:cut]
    else:
        i = data.draw(st.integers(0, len(payload) - 1), label="pos")
        b = data.draw(st.integers(0, 255), label="byte")
        mutated = payload[:i] + bytes([b]) + payload[i + 1 :]
    try:
        _parse_wav(mutated)
    except ValueError:
        pass
