"""Real-codec invariants: byte-level layout and malformed-input
rejection for the numpy BMP/WAV codecs."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from stakehouse_etl_spark.operators.multimodal import (
    _bmp_encode_one,
    _wav_encode_one,
)


def test_bmp_layout_is_real():
    for mid, w, h in [(0, 4, 3), (7, 8, 6), (123, 5, 4)]:
        b = _bmp_encode_one(mid, w, h)
        assert b[:2] == b"BM"
        file_sz = struct.unpack_from("<I", b, 2)[0]
        assert file_sz == len(b)  # header size field matches reality
        offset = struct.unpack_from("<I", b, 10)[0]
        assert offset == 54
        hw, hh = struct.unpack_from("<ii", b, 18)
        assert (hw, hh) == (w, h)
        stride = w * 3 + ((-(w * 3)) % 4)
        assert len(b) - 54 == stride * h
        assert stride % 4 == 0


def test_wav_layout_is_real():
    b = _wav_encode_one(42, 60)
    assert b[:4] == b"RIFF" and b[8:12] == b"WAVE"
    riff_sz = struct.unpack_from("<I", b, 4)[0]
    assert riff_sz + 8 == len(b)
    # a LIST chunk sits between fmt and data (chunk-walk required)
    assert b.find(b"LIST") > b.find(b"fmt ")
    assert b.find(b"data") > b.find(b"LIST")
    # python's own wave module can read it end-to-end
    import io
    import wave

    wf = wave.open(io.BytesIO(b))
    assert wf.getnchannels() == 1
    assert wf.getsampwidth() == 2
    assert wf.getframerate() == 16000
    assert wf.getnframes() == 60
    frames = np.frombuffer(wf.readframes(60), dtype="<i2")
    i = np.arange(60, dtype=np.int64)
    expect = ((i * 13 + 42 * 7) % 65536) - 32768
    assert (frames.astype(np.int64) == expect).all()


def test_decoders_reject_malformed(spark):
    from stakehouse_etl_spark.operators.multimodal import (
        decode_bmp,
        decode_wav,
    )

    bad = spark.createDataFrame(
        [(1, bytearray(b"not a real file at all"))],
        "media_id long, payload binary",
    )
    with pytest.raises(Exception):
        decode_bmp(bad).collect()
    with pytest.raises(Exception):
        decode_wav(bad).collect()
