"""TPU micro-benchmark harness: times model variants with one scan-jit
dispatch per variant (tunnel-immune, like bench.py). Run directly on the TPU.

Usage: python tools/perfprobe.py [variant ...]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

sys.path.insert(0, "/root/repo")

from pytorch3dunet_tpu.losses import BCEDiceLoss
from pytorch3dunet_tpu.models import get_model
from pytorch3dunet_tpu.utils.optim import create_optimizer


def jit_init(model, patch):
    example = jnp.zeros((1, *patch, model.in_channels), dtype=jnp.float32)
    return jax.jit(lambda rng, x: model.module.init(rng, x, train=False))(jax.random.PRNGKey(0), example)


def time_train(model, patch, batch, n=20, label=""):
    loss_criterion = BCEDiceLoss()
    tx = create_optimizer({"name": "Adam", "learning_rate": 2e-4})
    variables = jit_init(model, patch)
    opt_state = tx.init(variables["params"])

    def train_step(carry, _):
        params, opt_state, rng = carry
        rng, kx, ky = jax.random.split(rng, 3)
        x = jax.random.uniform(kx, (batch, *patch, model.in_channels), dtype=jnp.float32)
        y = (jax.random.uniform(ky, (batch, *patch, model.out_channels)) > 0.5).astype(jnp.float32)

        def loss_fn(p):
            probs, logits = model.module.apply({"params": p}, x, train=False)
            return loss_criterion(logits, y)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, new_opt = tx.update(grads, opt_state, params)
        return (optax.apply_updates(params, updates), new_opt, rng), loss

    @jax.jit
    def run(params, opt_state, rng):
        (params, opt_state, rng), losses = jax.lax.scan(train_step, (params, opt_state, rng), None, length=n)
        return losses[-1]

    loss = run(variables["params"], opt_state, jax.random.PRNGKey(7)); _ = float(loss)
    t0 = time.perf_counter()
    loss = run(variables["params"], opt_state, jax.random.PRNGKey(42))
    lf = float(loss)
    dt = (time.perf_counter() - t0) / n
    vox = batch * int(np.prod(patch))
    print(f"[train] {label}: {dt*1000:.1f} ms/step, {vox/dt/1e6:.1f} Mvox/s (loss={lf:.4f})", flush=True)
    return vox / dt


def time_fwd(model, patch, batch, n=30, label=""):
    variables = jit_init(model, patch)

    def fwd_step(carry, _):
        rng, acc = carry
        rng, kx = jax.random.split(rng)
        x = jax.random.uniform(kx, (batch, *patch, model.in_channels), dtype=jnp.float32)
        probs, logits = model.module.apply(variables, x, train=False)
        return (rng, acc + jnp.mean(logits)), None

    @jax.jit
    def run(rng):
        (rng, acc), _ = jax.lax.scan(fwd_step, (rng, jnp.float32(0)), None, length=n)
        return acc

    acc = run(jax.random.PRNGKey(7)); _ = float(acc)
    t0 = time.perf_counter()
    acc = run(jax.random.PRNGKey(42))
    af = float(acc)
    dt = (time.perf_counter() - t0) / n
    vox = batch * int(np.prod(patch))
    print(f"[fwd]   {label}: {dt*1000:.1f} ms/step, {vox/dt/1e6:.1f} Mvox/s (acc={af:.3f})", flush=True)
    return vox / dt


def unet3d(**over):
    cfg = {"name": "UNet3D", "in_channels": 1, "out_channels": 1, "f_maps": 32,
           "num_groups": 8, "final_sigmoid": True, "dtype": "bfloat16"}
    cfg.update(over)
    return get_model(cfg)


VARIANTS = {
    "train_b1": lambda: time_train(unet3d(), (80, 170, 170), 1, label="baseline b1 170"),
    "train_b1_160": lambda: time_train(unet3d(), (80, 160, 160), 1, label="b1 160 (2x-exact)"),
    "train_b2": lambda: time_train(unet3d(), (80, 170, 170), 2, label="b2 170"),
    "train_b4_128": lambda: time_train(unet3d(), (64, 128, 128), 4, label="b4 128"),
    "fwd_b1": lambda: time_fwd(unet3d(), (80, 170, 170), 1, label="baseline b1 170"),
    "fwd_nogn": lambda: time_fwd(unet3d(layer_order="cr"), (80, 170, 170), 1, label="no groupnorm"),
    "fwd_fp32": lambda: time_fwd(unet3d(dtype=None), (80, 170, 170), 1, label="fp32"),
    "train_b2_remat": lambda: time_train(unet3d(remat=True), (80, 170, 170), 2, label="b2 remat"),
    "train_b1_remat": lambda: time_train(unet3d(remat=True), (80, 170, 170), 1, label="b1 remat"),
}


if __name__ == "__main__":
    names = sys.argv[1:] or list(VARIANTS)
    for name in names:
        VARIANTS[name]()
