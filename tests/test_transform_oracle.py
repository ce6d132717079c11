"""Draw-for-draw parity of host transforms vs the LIVE reference implementation.

Each transform is constructed on both sides with an identically seeded
RandomState and applied to the same patch — outputs must agree numerically.
This pins the contract the paired-augmentation design depends on: our host
pipeline consumes random draws exactly like the reference
(reference augment/transforms.py; skimage-backed transforms are excluded —
scikit-image is not installed here, see utils/ndimage.py).
"""

import numpy as np
import pytest

from tests.test_torch_parity import _import_reference

CASES = [
    ("RandomFlip", {"axis_prob": 0.5}),
    ("RandomRotate90", {}),
    ("RandomRotate", {"angle_spectrum": 15, "axes": [[2, 1]], "order": 0}),
    ("RandomRotate", {"angle_spectrum": 25, "axes": [[2, 1], [2, 0]], "order": 3}),
    ("RandomContrast", {"alpha": [0.5, 1.5], "execution_probability": 1.0}),
    ("AdditiveGaussianNoise", {"scale": [0.0, 0.3], "execution_probability": 1.0}),
    ("AdditivePoissonNoise", {"lam": [0.0, 0.5], "execution_probability": 1.0}),
    ("Standardize", {"mean": 0.4, "std": 0.2}),
    ("Normalize", {}),
    ("PercentileNormalizer", {"pmin": 1, "pmax": 99.6}),
    ("ElasticDeformation", {"spline_order": 3, "alpha": 500, "sigma": 20,
                            "execution_probability": 1.0}),
    ("ElasticDeformation", {"spline_order": 0, "alpha": 500, "sigma": 20,
                            "apply_3d": False, "execution_probability": 1.0}),
    ("CropToFixed", {"size": [20, 20], "centered": False}),
    ("CropToFixed", {"size": [48, 48], "centered": True}),  # pads (size > patch)
]


@pytest.mark.parametrize("name,kwargs", CASES, ids=[f"{n}-{i}" for i, (n, _) in enumerate(CASES)])
def test_transform_matches_reference(name, kwargs):
    if not _import_reference():
        pytest.skip("reference package not importable")
    import pytorch3dunet.augment.transforms as ref_t

    import pytorch3dunet_tpu.augment.transforms as our_t

    x = np.random.RandomState(0).rand(16, 32, 32).astype(np.float32)
    for seed in (7, 1234):
        ref = getattr(ref_t, name)(random_state=np.random.RandomState(seed), **kwargs)
        ours = getattr(our_t, name)(random_state=np.random.RandomState(seed), **kwargs)
        want = ref(x.copy())
        got = ours(x.copy())
        assert np.asarray(want).shape == np.asarray(got).shape, (want.shape, got.shape)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6,
                                   err_msg=f"{name} diverges from the reference at seed {seed}")
