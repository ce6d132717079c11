"""Per-family FLOP accounting for the bench train legs (BENCH_NOTES r5).

Counts convolution FLOPs by walking the jaxpr of ONE train step (the same
step bench.py times, including backward + Adam), so the family throughput
table can be compared per-FLOP: `effective TF/s = FLOP/vox * vox/s`. Conv
FLOPs dominate every U-Net family; elementwise/norm glue is excluded on both
sides of the comparison, exactly like the r3 f_maps sweep.

Usage:  python tools/familyflops.py [family ...]
        (families: unet3d resunet3d resunetse3d unet2d; default all)
"""

import sys

import jax
import numpy as np

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, ".")
import bench  # noqa: E402


def _conv_flops(eqn) -> int:
    """2 * MACs of one conv_general_dilated eqn (fwd, igrad, and wgrad convs
    all appear as conv eqns in the differentiated jaxpr)."""
    lhs, rhs = eqn.invars[0].aval, eqn.invars[1].aval
    out = eqn.outvars[0].aval
    dn = eqn.params["dimension_numbers"]
    out_spatial = [out.shape[i] for i in dn.out_spec[2:]]
    batch = out.shape[dn.out_spec[0]]
    cout = out.shape[dn.out_spec[1]]
    cin = lhs.shape[dn.lhs_spec[1]]
    ksp = [rhs.shape[i] for i in dn.rhs_spec[2:]]
    groups = eqn.params.get("feature_group_count", 1)
    return 2 * batch * int(np.prod(out_spatial)) * cout * int(np.prod(ksp)) * cin // groups


def _dot_flops(eqn) -> int:
    """2 * MACs of a dot_general (SE-module FC layers)."""
    (cdims, _), (bdims, _) = (
        eqn.params["dimension_numbers"][0],
        eqn.params["dimension_numbers"][1],
    )
    lhs = eqn.invars[0].aval
    out = eqn.outvars[0].aval
    k = int(np.prod([lhs.shape[i] for i in cdims]))
    return 2 * int(np.prod(out.shape)) * k


def count_flops(jaxpr) -> int:
    total = 0
    for eqn in jaxpr.eqns:
        if eqn.primitive.name == "conv_general_dilated":
            total += _conv_flops(eqn)
        elif eqn.primitive.name == "dot_general":
            total += _dot_flops(eqn)
        else:
            from jax.extend import core as jex_core

            closed, open_ = jex_core.ClosedJaxpr, jex_core.Jaxpr
            for v in eqn.params.values():
                for w in v if isinstance(v, (tuple, list)) else (v,):
                    if isinstance(w, closed):
                        total += count_flops(w.jaxpr)
                    elif isinstance(w, open_):
                        total += count_flops(w)
    return total


def family_flops(name: str):
    cfg, patch, batch = bench.FAMILY_PRESETS[name]
    run_steps, variables, opt_state, (b, p) = bench.build_train_step(cfg, patch, batch)
    jaxpr = jax.make_jaxpr(lambda v, o, r: run_steps(v, o, r, 1))(
        variables, opt_state, jax.random.PRNGKey(0)
    )
    flops = count_flops(jaxpr.jaxpr)
    vox = b * int(np.prod(p))
    return flops, vox


if __name__ == "__main__":
    fams = sys.argv[1:] or list(bench.FAMILY_PRESETS)
    print(f"{'family':14} {'GFLOP/step':>12} {'MFLOP/vox':>10}")
    for f in fams:
        flops, vox = family_flops(f)
        print(f"{f:14} {flops / 1e9:12.2f} {flops / vox / 1e6:10.3f}")
