"""Native C++ connected-components labeler: parity with the scipy fallback."""

import numpy as np
import pytest
import scipy.ndimage as ndi

from pytorch3dunet_tpu.utils.native import get_native_lib, native_label


def _scipy_reference(m, background=0, connectivity=None):
    if connectivity is None:
        connectivity = m.ndim
    structure = ndi.generate_binary_structure(m.ndim, connectivity)
    out = np.zeros(m.shape, dtype=np.int64)
    next_label = 0
    for v in np.unique(m):
        if v == background:
            continue
        mask = m == v
        lbl, n = ndi.label(mask, structure=structure)
        out[mask] = lbl[mask] + next_label
        next_label += n
    return out, next_label


def _assert_equivalent(a, b):
    """Same partition of the volume (labels may be permuted)."""
    assert (a == 0).sum() == (b == 0).sum()
    np.testing.assert_array_equal(a == 0, b == 0)
    # bijection between label sets
    pairs = set(zip(a.ravel().tolist(), b.ravel().tolist()))
    a_to_b = {}
    b_to_a = {}
    for x, y in pairs:
        assert a_to_b.setdefault(x, y) == y
        assert b_to_a.setdefault(y, x) == x


native_available = get_native_lib() is not None


@pytest.mark.skipif(not native_available, reason="native library not built")
class TestNativeCC:
    @pytest.mark.parametrize("connectivity", [1, 2, 3])
    def test_random_binary_3d(self, connectivity):
        m = (np.random.RandomState(0).rand(12, 20, 20) > 0.6).astype(np.uint8)
        got, n_got = native_label(m, connectivity=connectivity)
        want, n_want = _scipy_reference(m, connectivity=connectivity)
        assert n_got == n_want
        _assert_equivalent(got, want)

    @pytest.mark.parametrize("connectivity", [1, 2])
    def test_random_multivalue_3d(self, connectivity):
        m = np.random.RandomState(1).randint(0, 4, (10, 16, 16))
        got, n_got = native_label(m, connectivity=connectivity)
        want, n_want = _scipy_reference(m, connectivity=connectivity)
        assert n_got == n_want
        _assert_equivalent(got, want)

    def test_2d(self):
        m = (np.random.RandomState(2).rand(40, 40) > 0.5).astype(np.uint8)
        got, n_got = native_label(m, connectivity=1)
        want, n_want = _scipy_reference(m, connectivity=1)
        assert n_got == n_want
        _assert_equivalent(got, want)

    def test_nonzero_background(self):
        m = np.random.RandomState(3).randint(0, 3, (8, 12, 12))
        got, n_got = native_label(m, background=1, connectivity=1)
        want, n_want = _scipy_reference(m, background=1, connectivity=1)
        assert n_got == n_want
        _assert_equivalent(got, want)

    def test_empty(self):
        m = np.zeros((4, 6, 6), dtype=np.uint8)
        got, n = native_label(m)
        assert n == 0
        assert (got == 0).all()
