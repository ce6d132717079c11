"""Property-based fuzzing of the geometry-critical invariants (hypothesis).

The patch grid, mirror padding, and slab reflection indexing are the
correctness substrate of the whole prediction path; example-based tests pin
known shapes, these pin the INVARIANTS over randomized shapes.
"""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from pytorch3dunet_tpu.datasets.utils import SliceBuilder, mirror_pad, remove_padding
from pytorch3dunet_tpu.predictor import _read_padded_slab


dims = st.tuples(st.integers(6, 20), st.integers(8, 28), st.integers(8, 28))


@settings(max_examples=40, deadline=None)
@given(
    shape=dims,
    patch=st.tuples(st.integers(2, 8), st.integers(3, 10), st.integers(3, 10)),
    stride=st.tuples(st.integers(1, 8), st.integers(1, 10), st.integers(1, 10)),
)
def test_slice_builder_visits_every_voxel(shape, patch, stride):
    patch = tuple(min(p, s) for p, s in zip(patch, shape))
    stride = tuple(min(st_, p) for st_, p in zip(stride, patch))
    raw = np.zeros(shape, dtype=np.float32)
    sb = SliceBuilder(raw, None, patch_shape=patch, stride_shape=stride, skip_shape_check=True)

    visited = np.zeros(shape, dtype=bool)
    for idx in sb.raw_slices:
        sl = idx[-3:]
        # every slice is in-bounds and exactly patch-shaped
        for s, p, dim in zip(sl, patch, shape):
            assert 0 <= s.start and s.stop <= dim and s.stop - s.start == p
        visited[sl] = True
    assert visited.all(), f"grid misses voxels for shape={shape} patch={patch} stride={stride}"


@settings(max_examples=40, deadline=None)
@given(shape=dims, halo=st.tuples(st.integers(0, 4), st.integers(0, 6), st.integers(0, 6)))
def test_mirror_pad_remove_padding_roundtrip(shape, halo):
    halo = tuple(min(h, s - 1) for h, s in zip(halo, shape))  # reflect needs halo < dim
    vol = np.random.RandomState(0).rand(*shape).astype(np.float32)
    padded = mirror_pad(vol, halo)
    assert padded.shape == tuple(s + 2 * h for s, h in zip(shape, halo))
    # remove_padding crops a channels-first (C, ...) prediction; add the axis
    back = remove_padding(padded[None], halo)[0]
    np.testing.assert_array_equal(back, vol)


@settings(max_examples=60, deadline=None)
@given(
    shape=dims,
    halo=st.tuples(st.integers(0, 4), st.integers(0, 5), st.integers(0, 5)),
    channels_first=st.booleans(),
    data=st.data(),
)
def test_read_padded_slab_matches_mirror_pad(shape, halo, channels_first, data):
    halo = tuple(min(h, s - 1) for h, s in zip(halo, shape))
    rs = np.random.RandomState(1)
    vol = rs.rand(*shape).astype(np.float32)
    padded_depth = shape[0] + 2 * halo[0]
    z_lo = data.draw(st.integers(0, padded_depth - 1), label="z_lo")
    z_hi = data.draw(st.integers(z_lo + 1, padded_depth), label="z_hi")

    full = mirror_pad(vol, halo)
    if channels_first:
        raw = np.stack([vol, vol * 2.0])  # (C, D, H, W)
        want = np.stack([full, full * 2.0], axis=-1)[z_lo:z_hi]  # (dz, H, W, C)
    else:
        raw = vol
        want = full[z_lo:z_hi]
    got = _read_padded_slab(raw, halo, z_lo, z_hi)
    np.testing.assert_allclose(np.squeeze(got), np.squeeze(want), atol=0)


@settings(max_examples=25, deadline=None)
@given(axes=st.lists(st.sampled_from([1, 2, 3]), min_size=1, max_size=3, unique=True))
def test_tta_identity_model_is_exact(axes):
    """An identity 'model' must pass through TTA unchanged: every flip is
    inverted before averaging, so the ensemble of identities is the input."""
    import jax.numpy as jnp

    from pytorch3dunet_tpu.ops.tta import flip_combos, tta_average

    x = jnp.asarray(np.random.RandomState(2).rand(1, 4, 5, 6, 2).astype(np.float32))
    out = tta_average(lambda v: v, x, flip_combos(tuple(axes)))
    np.testing.assert_allclose(np.asarray(out), np.asarray(x), atol=1e-6)
