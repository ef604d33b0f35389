"""Native C++ codec parity: decode/encode must match the NumPy reference
paths bit-for-bit (the library auto-builds via make; tests skip if no
toolchain)."""

import numpy as np
import pytest

from strugatzki_tpu.io import native
from strugatzki_tpu.io.audiofile import _decode_samples, _encode_samples


pytestmark = pytest.mark.skipif(native.lib() is None,
                                reason="native codec unavailable")


@pytest.mark.parametrize("fmt", ["int16", "int24", "int32", "float", "double"])
@pytest.mark.parametrize("big_endian", [True, False])
def test_decode_matches_numpy(fmt, big_endian):
    rng = np.random.default_rng(0)
    data = rng.uniform(-1, 1, size=(3, 500)).astype(np.float32)
    raw = _encode_samples(np.ascontiguousarray(data.T), fmt, big_endian)
    ours = native.decode(raw, 500, 3, fmt, big_endian)
    ref = _decode_samples(raw, fmt, big_endian).reshape(500, 3).T
    np.testing.assert_array_equal(ours, ref)


@pytest.mark.parametrize("fmt", ["int16", "int24", "int32", "float", "double"])
@pytest.mark.parametrize("big_endian", [True, False])
def test_encode_matches_numpy(fmt, big_endian):
    rng = np.random.default_rng(1)
    data = rng.uniform(-1, 1, size=(2, 333)).astype(np.float32)
    # include exact boundary values
    data[0, 0] = 1.0
    data[0, 1] = -1.0
    data[1, 0] = 0.0
    ours = native.encode(data, fmt, big_endian)
    ref = _encode_samples(np.ascontiguousarray(data.T), fmt, big_endian)
    assert ours == ref


def test_fix_nans_native_matches_python():
    from strugatzki_tpu.analysis.extraction import fix_nans
    rng = np.random.default_rng(2)
    x = rng.standard_normal((4, 3000)).astype(np.float32)
    x[1, 5] = np.nan
    x[1, 1024] = np.nan      # chunk boundary: carried value resets to 0
    x[2, 0] = np.nan         # leading NaN -> 0
    x[3, 2999] = np.nan
    ref = fix_nans(x)
    nat = x.copy()
    assert native.fix_nans(nat)
    np.testing.assert_array_equal(nat, ref)
