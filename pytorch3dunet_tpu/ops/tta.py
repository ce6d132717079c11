"""Test-time augmentation: mirror-flip ensembling for prediction.

The reference framework has no TTA; this is a TPU-native addition. Each
forward is replaced by the average of the model's probabilities over every
combination of mirror flips of the selected spatial axes (nnU-Net-style
mirroring — 8 forwards for a 3D model, 4 for 2D). Because the flip ensemble
runs *inside* the jitted forward (and, for the device sweep, inside the
single-dispatch patch loop), enabling it costs compute only — no extra
host<->device transfers and no per-flip dispatch latency.

Flips commute with the halo crop (a flip of the haloed patch maps halo onto
halo), so the ensemble wraps the raw model forward and the existing stitching
machinery is untouched.
"""

from itertools import chain, combinations

import jax.numpy as jnp


def flip_combos(axes) -> list[tuple[int, ...]]:
    """All subsets of `axes` (including the empty identity combo).

    `axes` are array axes of the model-ready batch; the result drives
    `tta_average` (len == 2**len(axes) forwards).
    """
    axes = tuple(dict.fromkeys(int(a) for a in axes))  # dedupe, keep order
    return [tuple(c) for c in chain.from_iterable(combinations(axes, r) for r in range(len(axes) + 1))]


def tta_average(apply_fn, x, combos):
    """Mean of `apply_fn` over mirror flips of `x`.

    apply_fn must map x -> output with the SAME spatial layout as x (true for
    the segmentation forward: channels-last in, channels-last probabilities
    out). Each output is inverse-flipped (flips are involutions) before
    averaging. `combos` is a list of tuples of array axes, typically from
    `flip_combos`.
    """
    assert combos, "tta_average needs at least one flip combo (use [()] for identity)"
    acc = None
    for axes in combos:
        xf = jnp.flip(x, axes) if axes else x
        p = apply_fn(xf)
        p = jnp.flip(p, axes) if axes else p
        acc = p if acc is None else acc + p
    return acc / len(combos)


def resolve_tta_axes(tta, tta_axes, is_2d: bool) -> tuple[int, ...]:
    """Normalizes the (tta, tta_axes) config pair to patch-space flip axes.

    `tta_axes` uses the reference's spatial order (0=z, 1=y, 2=x); default is
    every flippable axis. 2D models sweep singleton-z patches, so z is never
    flippable and is dropped (with a ValueError only if the user asked for z
    explicitly AND nothing else remains).
    """
    if not tta:
        return ()
    if tta_axes is None:
        axes = (1, 2) if is_2d else (0, 1, 2)
    else:
        axes = tuple(int(a) for a in tta_axes)
    if any(a not in (0, 1, 2) for a in axes):
        raise ValueError(f"tta_axes must be within (0, 1, 2) [z, y, x]; got {tta_axes}")
    if is_2d:
        axes = tuple(a for a in axes if a != 0)
        if not axes:
            raise ValueError("tta_axes for a 2D model must include a spatial axis (1=y, 2=x)")
    return axes
