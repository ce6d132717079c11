"""Spatial (depth-axis) model parallelism for training: shard_map + halo
exchange.

The reference cannot parallelize a batch-1 workload at all (nn.DataParallel
splits the batch, pytorch3dunet/unet3d/trainer.py:202-205). Here the PATCH
itself is sharded: the D axis of the volume is split across the 'space' mesh
axis, every 3x3x3 convolution exchanges one boundary plane with each
neighbor over ICI (jax.lax.ppermute, wired inside ops/conv.py when a spatial
axis is active), GroupNorm statistics are psum'd so normalization matches the
unsharded model exactly, and the loss is computed on all-gathered logits so
gradients are exact — training with batch 1 keeps every chip busy.

Constraints (validated by `spatial_shardable`): the D extent must stay
divisible by the shard count through every pooling level, and kernels must be
3x3x3/stride-1 on the sharded axis (the UNet families all qualify).
"""

import contextlib
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

SPACE_AXIS = "space"

# the active spatial axis name, observed by ops/conv.py (halo exchange) and
# models/blocks.py (psum'd GroupNorm stats). Set via `spatial_axis(...)`.
_ACTIVE_AXIS: list = [None]


def active_spatial_axis():
    return _ACTIVE_AXIS[-1]


@contextlib.contextmanager
def spatial_axis(name: str):
    """Marks a mesh axis as the spatial (D) shard axis for ops traced inside."""
    _ACTIVE_AXIS.append(name)
    try:
        yield
    finally:
        _ACTIVE_AXIS.pop()


def spatial_shardable(patch_d: int, num_levels: int, n_shards: int, pool: int = 2,
                      min_local: int = 1) -> bool:
    """Whether a D extent stays EXACTLY shardable through all pooling levels.

    Exactness requires, at every pyramid level: (a) the depth divides evenly
    across shards with at least `min_local` local planes (deconv-upsampling
    models need 2 — their index fix-up gathers a 2-plane halo, and fewer
    planes would truncate it; nearest-upsampling models work with 1), and
    (b) the depth divides the pool stride — the real encoder floor-pools, and
    under sharding each shard would crop ITS OWN trailing plane instead of
    the one global plane, silently computing a different function."""
    if n_shards <= 1:
        return True
    d = patch_d
    for level in range(num_levels):
        if d % n_shards != 0 or (d // n_shards) < min_local:
            return False
        if level < num_levels - 1:
            if d % pool != 0:
                return False
            d //= pool
    return True


def space_mesh(n_devices: int | None = None, devices=None) -> Mesh:
    devices = list(jax.devices() if devices is None else devices)
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (SPACE_AXIS,))


def choose_space_mesh(patch_d: int, num_levels: int, min_local: int = 1, pool: int = 2) -> Mesh:
    """Largest device count that keeps every pooling level evenly sharded
    (min_local=2 for deconv-upsampling models — see spatial_shardable;
    `pool` is the D component of the model's pool_kernel_size — anisotropic
    models with pool (1, 2, 2) keep D constant through the pyramid)."""
    n = jax.device_count()
    while n > 1 and not spatial_shardable(patch_d, num_levels, n, pool=pool, min_local=min_local):
        n -= 1
    return space_mesh(n)


def spatial_min_local(model) -> int:
    """Minimum local planes per shard the model family needs (deconv
    upsampling gathers a 2-plane halo in its index fix-up)."""
    from pytorch3dunet_tpu.models.unet import _resolve_upsample

    mode, _ = _resolve_upsample(model.module.upsample, model.module.basic_module)
    return 2 if mode == "deconv" else 1


def spatial_pool_d(model) -> int:
    """D component of the model's pooling stride (what the D pyramid divides by)."""
    pk = model.pool_kernel_size
    return int(pk) if isinstance(pk, int) else int(pk[0])


def validate_spatial_model(model) -> None:
    """Spatial sharding covers every 3D model family: DoubleConv (3x3x3
    'same' convs with halo exchange, psum'd GroupNorm, local pooling/nearest
    upsampling) and the ResNet/SE families (psum'd SE squeeze in models/se.py,
    halo'd + index-fixed deconv upsampling in the Decoder). BatchNorm remains
    unsupported (its running stats are not psum-wired)."""
    assert model.is3d, "spatial sharding is for 3D models"
    assert "b" not in model.module.layer_order, "BatchNorm is not supported under spatial sharding"
    from pytorch3dunet_tpu.ops import packed

    assert not packed.enabled(), (
        "P3DUNET_PACKED is not supported under spatial sharding: PackedGroupNorm "
        "has no psum wiring, so statistics would silently be per-shard"
    )
    # the ResNet/SE families upsample with a stride-2 transposed conv whose
    # sharded index fix-up only covers isotropic 2x (blocks.py); fail upfront
    # with a clear message instead of mid-trace
    from pytorch3dunet_tpu.models.unet import _resolve_upsample

    mode, _ = _resolve_upsample(model.module.upsample, model.module.basic_module)
    if mode == "deconv":
        pk = model.module.pool_kernel_size
        pk = (pk,) * 3 if isinstance(pk, int) else tuple(pk)
        assert pk == (2, 2, 2), (
            f"spatial sharding supports deconv upsampling only for isotropic 2x "
            f"scale factors, got pool_kernel_size={pk}"
        )


def spatial_deconv_fixup_indices(axis_name: str, d_local: int):
    """Local D-gather indices reproducing `nearest-resize(2D-1 -> 2D)` of a
    stride-2/kernel-3 transposed conv under D sharding.

    The Decoder computes the transposed conv WITHOUT depth cropping on a
    2-plane-haloed slab: local full-output plane j corresponds to global
    torch-padded-output plane j + 2*(g0 - 2), i.e. global torch-out index
    q = j + 2*g0 - 5 (torch pad=1 crops one plane). The nearest fix-up maps
    final plane p to q(p) = floor(p * (2D-1) / (2D)) (torch index semantics,
    ops/interp.py); solving for j gives the gather below. A halo of 2 planes
    bounds every needed q within the local slab's valid region."""
    n = jax.lax.axis_size(axis_name)
    idx = jax.lax.axis_index(axis_name)
    D = n * d_local
    t = jnp.arange(2 * d_local)
    p = idx * (2 * d_local) + t
    q = (p * (2 * D - 1)) // (2 * D)
    return q - 2 * (idx * d_local) + 5


def halo_exchange_d(x, axis_name: str, pad: int = 1):
    """Concatenates `pad` boundary planes from each neighbor along axis 1
    (the D axis of an (N, D, H, W, C) shard). Non-periodic: the outermost
    shards get zero halos, matching torch zero padding."""
    assert x.shape[1] >= pad, (
        f"local depth {x.shape[1]} < halo {pad}: slicing would silently truncate "
        f"the halo — increase the patch depth or reduce the shard count"
    )
    n = jax.lax.axis_size(axis_name)
    idx = jax.lax.axis_index(axis_name)
    fwd = [(i, (i + 1) % n) for i in range(n)]
    bwd = [(i, (i - 1) % n) for i in range(n)]
    # my last planes -> right neighbor's left halo; my first -> left's right
    left_halo = jax.lax.ppermute(x[:, -pad:], axis_name, fwd)
    right_halo = jax.lax.ppermute(x[:, :pad], axis_name, bwd)
    zero = jnp.zeros_like(x[:, :pad])
    left_halo = jnp.where(idx == 0, zero, left_halo)
    right_halo = jnp.where(idx == n - 1, zero, right_halo)
    return jnp.concatenate([left_halo, x, right_halo], axis=1)


def build_spatial_train_step(model, loss_criterion, tx, mesh: Mesh, mutable_keys=()):
    """Returns a jitted train step whose inputs are sharded on D over `mesh`.

    step(variables, opt_state, rng, inp, target) -> (variables, opt_state,
    loss, probs); inp/target are (N, D, H, W, C[_t]) global arrays sharded
    with `shard_spatial_batch`. Gradients are exact: the loss consumes
    all-gathered logits, so dLoss/dParams only needs the psum the shard_map
    reduction inserts.
    """
    axis = mesh.axis_names[0]
    mutable_keys = list(mutable_keys)

    def shard_fn(variables, opt_state, rng, inp, target):
        aux_state = {k: v for k, v in variables.items() if k != "params"}
        # decorrelate dropout across shards (each shard sees its own D slab)
        rng = jax.random.fold_in(rng, jax.lax.axis_index(axis))

        def loss_fn(params):
            all_vars = {"params": params, **aux_state}
            with spatial_axis(axis):
                if mutable_keys:
                    (probs, logits), new_state = model.module.apply(
                        all_vars, inp, train=True, rngs={"dropout": rng}, mutable=mutable_keys
                    )
                else:
                    probs, logits = model.module.apply(all_vars, inp, train=True, rngs={"dropout": rng})
                    new_state = {}
            # gather the (small: out_channels-wide) logits so loss terms that
            # mix voxels globally (Dice denominators, WCE class weights)
            # match the unsharded computation exactly
            logits_full = jax.lax.all_gather(logits, axis, axis=1, tiled=True)
            target_full = jax.lax.all_gather(target, axis, axis=1, tiled=True)
            loss = loss_criterion(logits_full, target_full)
            return loss, (probs, new_state)

        (loss, (probs, new_state)), grads = jax.value_and_grad(loss_fn, has_aux=True)(variables["params"])
        # pmean, not psum: the transpose of all_gather already SUMS the n
        # replicated loss cotangents into each shard's logits cotangent, so
        # the per-shard grads carry an extra factor n that pmean cancels while
        # combining the shards' partial contributions
        grads = jax.lax.pmean(grads, axis)
        new_state = jax.lax.pmean(new_state, axis) if new_state else new_state
        updates, new_opt_state = tx.update(grads, opt_state, variables["params"])
        new_params = optax.apply_updates(variables["params"], updates)
        new_variables = {"params": new_params, **aux_state, **new_state}
        return new_variables, new_opt_state, loss, probs

    rep = P()
    sharded = P(None, axis)
    fn = jax.shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(rep, rep, rep, sharded, sharded),
        out_specs=(rep, rep, rep, sharded),
        check_vma=False,
    )
    return jax.jit(fn, donate_argnums=(0, 1))


def build_spatial_accum_fns(model, loss_criterion, tx, mesh: Mesh, k: int, mutable_keys=()):
    """Gradient-accumulation twins of `build_spatial_train_step`.

    Returns (grads_step, apply_step, zeros) with the trainer's accumulation
    contract (trainer._build_accum_fns): `grads_step(variables, rng, inp,
    target, acc)` adds this microbatch's pmean'd gradients into the replicated
    accumulator; `apply_step` averages over k and applies one update. Composes
    the two multi-chip strategies: D-sharded compute per microbatch, one
    optimizer step per k microbatches.
    """
    axis = mesh.axis_names[0]
    mutable_keys = list(mutable_keys)

    def shard_fn(variables, rng, inp, target, acc):
        aux_state = {key: v for key, v in variables.items() if key != "params"}
        rng = jax.random.fold_in(rng, jax.lax.axis_index(axis))

        def loss_fn(params):
            all_vars = {"params": params, **aux_state}
            with spatial_axis(axis):
                if mutable_keys:
                    (probs, logits), new_state = model.module.apply(
                        all_vars, inp, train=True, rngs={"dropout": rng}, mutable=mutable_keys
                    )
                else:
                    probs, logits = model.module.apply(all_vars, inp, train=True, rngs={"dropout": rng})
                    new_state = {}
            logits_full = jax.lax.all_gather(logits, axis, axis=1, tiled=True)
            target_full = jax.lax.all_gather(target, axis, axis=1, tiled=True)
            loss = loss_criterion(logits_full, target_full)
            return loss, (probs, new_state)

        (loss, (probs, new_state)), grads = jax.value_and_grad(loss_fn, has_aux=True)(variables["params"])
        grads = jax.lax.pmean(grads, axis)  # gathered-loss convention, see build_spatial_train_step
        new_state = jax.lax.pmean(new_state, axis) if new_state else new_state
        new_acc = jax.tree_util.tree_map(jnp.add, acc, grads)
        new_variables = {"params": variables["params"], **aux_state, **new_state}
        return new_variables, new_acc, loss, probs

    rep = P()
    sharded = P(None, axis)
    grads_fn = jax.shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(rep, rep, sharded, sharded, rep),
        out_specs=(rep, rep, rep, sharded),
        check_vma=False,
    )

    def apply_step(variables, opt_state, acc):
        grads = jax.tree_util.tree_map(lambda g: g / k, acc)
        updates, new_opt_state = tx.update(grads, opt_state, variables["params"])
        new_params = optax.apply_updates(variables["params"], updates)
        return {**variables, "params": new_params}, new_opt_state

    zeros = jax.jit(lambda params: jax.tree_util.tree_map(jnp.zeros_like, params))
    return (
        jax.jit(grads_fn, donate_argnums=(4,)),
        jax.jit(apply_step, donate_argnums=(0, 1, 2)),
        zeros,
    )


def dp_sp_mesh(n_data: int, n_space: int) -> Mesh:
    """2-D mesh composing data and spatial parallelism: ('data', 'space')."""
    devices = np.asarray(jax.devices()[: n_data * n_space]).reshape(n_data, n_space)
    return Mesh(devices, ("data", SPACE_AXIS))


def build_dp_sp_train_step(model, loss_criterion, tx, mesh: Mesh):
    """Composed DP x SP train step over a ('data', 'space') mesh: the batch
    axis shards over 'data', the patch's D axis over 'space'. Gradients
    pmean over 'space' (gathered-loss convention, see build_spatial_train_step)
    and over 'data' (per-shard batch-mean losses) — together: the global
    batch-mean gradient, exactly as on one device."""
    data_axis, sp_axis = mesh.axis_names

    def shard_fn(variables, opt_state, rng, inp, target):
        # aux collections (e.g. batch stats) have no pmean wiring here;
        # build_spatial_train_step carries them — fail loudly, not silently
        extra = [k for k in variables if k != "params"]
        if extra:
            raise NotImplementedError(
                f"build_dp_sp_train_step supports params-only models; found {extra} "
                "(use spatial_sharding without data parallelism for stateful models)"
            )
        rng = jax.random.fold_in(rng, jax.lax.axis_index(data_axis))
        rng = jax.random.fold_in(rng, jax.lax.axis_index(sp_axis))

        def loss_fn(params):
            with spatial_axis(sp_axis):
                probs, logits = model.module.apply(
                    {"params": params}, inp, train=True, rngs={"dropout": rng}
                )
            logits_full = jax.lax.all_gather(logits, sp_axis, axis=1, tiled=True)
            target_full = jax.lax.all_gather(target, sp_axis, axis=1, tiled=True)
            return loss_criterion(logits_full, target_full), probs

        (loss, probs), grads = jax.value_and_grad(loss_fn, has_aux=True)(variables["params"])
        grads = jax.lax.pmean(jax.lax.pmean(grads, sp_axis), data_axis)
        loss = jax.lax.pmean(loss, data_axis)
        updates, new_opt_state = tx.update(grads, opt_state, variables["params"])
        new_params = optax.apply_updates(variables["params"], updates)
        return {"params": new_params}, new_opt_state, loss, probs

    rep = P()
    sharded = P(data_axis, sp_axis)
    fn = jax.shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(rep, rep, rep, sharded, sharded),
        out_specs=(rep, rep, rep, sharded),
        check_vma=False,
    )
    return jax.jit(fn, donate_argnums=(0, 1))


def shard_dp_sp_batch(mesh: Mesh, tree):
    """(N, D, ...) arrays: N over 'data', D over 'space'."""
    data_axis, sp_axis = mesh.axis_names

    def _put(x):
        if not isinstance(x, jax.Array):
            x = np.asarray(x)
        spec = P(data_axis, sp_axis) if x.ndim >= 2 else P()
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map(_put, tree)


def build_spatial_eval_step(model, loss_criterion, mesh: Mesh):
    """Forward + loss over the spatial mesh (validation counterpart)."""
    axis = mesh.axis_names[0]

    def shard_fn(variables, inp, target):
        with spatial_axis(axis):
            probs, logits = model.module.apply(variables, inp, train=False)
        logits_full = jax.lax.all_gather(logits, axis, axis=1, tiled=True)
        target_full = jax.lax.all_gather(target, axis, axis=1, tiled=True)
        return probs, loss_criterion(logits_full, target_full)

    fn = jax.shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(P(), P(None, axis), P(None, axis)),
        out_specs=(P(None, axis), P()),
        check_vma=False,
    )
    return jax.jit(fn)


def shard_spatial_batch(mesh: Mesh, tree):
    """Places (N, D, ...) arrays with D sharded over the 'space' axis."""
    axis = mesh.axis_names[0]

    def _put(x):
        if not isinstance(x, jax.Array):
            x = np.asarray(x)
        spec = P(None, axis) if x.ndim >= 2 else P()
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map(_put, tree)


def replicate_spatial(mesh: Mesh, tree):
    return jax.device_put(tree, NamedSharding(mesh, P()))
