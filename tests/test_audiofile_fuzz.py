"""Codec robustness fuzz: corrupt or truncated files must either parse or
raise IOError promptly — never hang (the round-2 advisor found a Wave64
infinite loop), never surface internal exception types, never over-allocate.

The reference leans on libsndfile/javax.sound for this hardening; our
from-scratch parsers (io/audiofile.py) get the property pinned by fuzz."""

import signal

import numpy as np
import pytest

from strugatzki_tpu.io import audiofile as AF


class _Alarm(Exception):
    pass


def _with_deadline(fn, seconds=20):
    """Convert a parser hang into a test failure (SIGALRM, main thread)."""
    def handler(sig, frame):
        raise _Alarm("parser exceeded deadline — possible infinite loop")
    old = signal.signal(signal.SIGALRM, handler)
    signal.alarm(seconds)
    try:
        return fn()
    finally:
        signal.alarm(0)
        signal.signal(signal.SIGALRM, old)


def _valid_file(tmp_path, container, fmt):
    rng = np.random.default_rng(0)
    data = (rng.standard_normal((2, 300)) * 0.3).astype(np.float32)
    p = tmp_path / f"base_{container}_{fmt}"
    AF.write(p, data, AF.AudioFileSpec(container, fmt, 2, 44100.0, 300))
    return p.read_bytes()


_CASES = [(AF.AIFF, AF.SampleFormat.FLOAT), (AF.AIFF, AF.SampleFormat.INT16),
          (AF.WAVE, AF.SampleFormat.INT16), (AF.WAVE, AF.SampleFormat.FLOAT),
          (AF.IRCAM, AF.SampleFormat.FLOAT), (AF.NEXT, AF.SampleFormat.INT16),
          (AF.WAVE64, AF.SampleFormat.INT24)]


def _try_read(path):
    try:
        data, spec = AF.read(path)
        assert data.ndim == 2
    except IOError:
        pass        # the documented corrupt-file contract (incl. OSError)


@pytest.mark.parametrize("container,fmt", _CASES)
def test_truncations_parse_or_ioerror(tmp_path, container, fmt):
    raw = _valid_file(tmp_path, container, fmt)
    p = tmp_path / "trunc"
    # every header-region prefix, then coarse steps through the data
    cuts = list(range(0, min(len(raw), 128))) + \
        list(range(128, len(raw), 97))
    for cut in cuts:
        p.write_bytes(raw[:cut])
        _with_deadline(lambda: _try_read(p))


@pytest.mark.parametrize("container,fmt", _CASES)
def test_byte_corruptions_parse_or_ioerror(tmp_path, container, fmt):
    raw = bytearray(_valid_file(tmp_path, container, fmt))
    rng = np.random.default_rng(hash((container, fmt)) % 2**32)
    p = tmp_path / "fuzz"
    header = min(len(raw), 160)
    for trial in range(200):
        mut = bytearray(raw)
        # bias corruption into the header where the parser logic lives
        n_flips = int(rng.integers(1, 5))
        for _ in range(n_flips):
            pos = int(rng.integers(0, header if trial % 2 else len(raw)))
            mut[pos] = int(rng.integers(0, 256))
        p.write_bytes(bytes(mut))
        _with_deadline(lambda: _try_read(p))


@pytest.mark.parametrize("container,fmt", _CASES)
def test_size_field_extremes(tmp_path, container, fmt):
    """Chunk/count fields forced to extremes (0, huge) — the classic
    hang/over-allocation shapes — at every 4-byte offset in the header."""
    raw = bytearray(_valid_file(tmp_path, container, fmt))
    p = tmp_path / "sizes"
    for off in range(0, min(len(raw) - 8, 96), 4):
        for val in (b"\x00\x00\x00\x00", b"\xff\xff\xff\xff",
                    b"\xff\xff\xff\xff\xff\xff\xff\xff"):
            mut = bytearray(raw)
            mut[off:off + len(val)] = val
            p.write_bytes(bytes(mut))
            _with_deadline(lambda: _try_read(p))
