"""Benchmark: UNet3D training throughput (voxels/sec/chip) on the reference's
canonical 3D workload.

Workload = the 3DUnet_confocal_boundary headline configuration
(reference resources/3DUnet_confocal_boundary/train_config.yml: patch
80x170x170, batch 1, f_maps 32, layer_order gcr, BCEDiceLoss-style training),
measured as full train steps (forward + loss + backward + Adam update) on one
chip, bf16 compute / fp32 params.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

vs_baseline: the reference publishes no throughput numbers (BASELINE.md). The
denominator used here is an estimated A100 throughput for the reference torch
implementation on the same workload: ~23 Mvoxels/s (3.1 TFLOP/step at ~35%
TF32 utilization on a 312 TFLOP A100 — see BENCH_NOTES.md for the
derivation). vs_baseline = measured voxels/sec / 23e6.
"""

import json
import os
import time

# stdout carries exactly one JSON line; all framework logging goes to stderr
os.environ.setdefault("P3DUNET_LOG_STDERR", "1")

import jax
import jax.numpy as jnp
import numpy as np
import optax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

A100_REFERENCE_VOXELS_PER_SEC = 23e6

PATCH = (80, 170, 170)

# --- model-family presets (BENCH_NOTES r5) -------------------------------
# Every previous TPU number was UNet3D gcr concat-join; these legs measure
# the other BASELINE model families at their canonical recipe shapes:
#   resunet3d   — ResidualUNet3D, the 3DUnet_lightsheet_boundary recipe
#                 (reference resources/3DUnet_lightsheet_boundary/
#                 train_config.yml: f_maps 32, gcr, patch 80x170x170, b=1);
#                 sum-join + deconv decoder (reference buildingblocks.py:387-493).
#   resunetse3d — ResidualUNetSE3D (model zoo; no recipe ships it) at the
#                 same canonical 3D shape; adds cSE/sSE global pooling
#                 (reference se.py:18-114).
#   unet2d      — UNet2D TRAINING at the 2DUnet_dsb2018 recipe shape
#                 (f_maps [32,64,128], layer_order bcr → BatchNorm,
#                 256x256 crops, batch 32).
FAMILY_PRESETS = {
    "unet3d": (
        None,  # filled in build_train_step from FMAPS
        PATCH,
        1,
    ),
    "resunet3d": (
        {
            "name": "ResidualUNet3D", "in_channels": 1, "out_channels": 1,
            "f_maps": 32, "layer_order": "gcr", "num_groups": 8,
            "final_sigmoid": True, "dtype": "bfloat16",
        },
        PATCH,
        1,
    ),
    "resunetse3d": (
        {
            "name": "ResidualUNetSE3D", "in_channels": 1, "out_channels": 1,
            "f_maps": 32, "layer_order": "gcr", "num_groups": 8,
            "final_sigmoid": True, "dtype": "bfloat16",
            # no stabilizers: the "divergence" that originally motivated a
            # clip+tiny-LR pair here was the SE/pool fusion miscompile
            # (BENCH_NOTES r5 SE dossier); with the barrier fix a 400-step
            # Adam run at the standard 2e-4 stays finite on-chip (se_nostab)
        },
        PATCH,
        1,
    ),
    "unet2d": (
        {
            "name": "UNet2D", "in_channels": 1, "out_channels": 1,
            "f_maps": [32, 64, 128], "layer_order": "bcr",
            "final_sigmoid": True, "dtype": "bfloat16",
        },
        (256, 256),
        32,
    ),
    # 3DUnet_denoising recipe (reference resources/3DUnet_denoising/
    # train_config_regression.yaml): regression UNet3D, f_maps 16 x 5 levels,
    # 128^3 patches, SmoothL1 — the last BASELINE config without a chip number
    "denoise3d": (
        {
            "name": "UNet3D", "in_channels": 1, "out_channels": 1,
            "f_maps": [16, 32, 64, 128, 256], "layer_order": "gcr",
            "num_groups": 8, "final_sigmoid": False, "is_segmentation": False,
            "dtype": "bfloat16",
            "_loss": "SmoothL1Loss",
        },
        (128, 128, 128),
        1,
    ),
}
# train-step conv+matmul FLOPs per voxel, counted from the differentiated
# jaxpr of the exact step each leg times (tools/familyflops.py). Family
# vs_baseline uses the MATCHED denominator: the same A100 estimate method as
# the canonical 23 Mvox/s, scaled to the family's own FLOP/vox (same chip,
# same assumed utilization, more work per voxel -> proportionally fewer
# voxels/sec on the reference side).
FAMILY_MFLOP_PER_VOX = {
    "unet3d": 1.361,
    "resunet3d": 1.893,
    "resunetse3d": 1.893,
    "unet2d": 0.554,
    "denoise3d": 0.370,
}
# which single leg to run when set (raw measurement runs); the default main()
# run measures the headline plus every family leg (P3DUNET_BENCH_FAMILIES)
BENCH_MODEL = os.environ.get("P3DUNET_BENCH_MODEL", "unet3d")
# experiment knobs (the shipping benchmark uses the defaults)
BATCH = int(os.environ.get("P3DUNET_BENCH_BATCH", "1"))
REMAT = os.environ.get("P3DUNET_BENCH_REMAT", "0") == "1"
# 100 steps per dispatch: at 20 the tunnel's fixed per-dispatch latency still
# dilutes the number by ~1.5% (measured 23.94 at N=20 vs 24.29 at N=100)
N_STEPS = int(os.environ.get("P3DUNET_BENCH_STEPS", "100"))
# gradient accumulation: k batch-sized microbatches per optimizer update
# (trainer.grad_accum_steps); voxels/step scales by k
ACCUM = int(os.environ.get("P3DUNET_BENCH_ACCUM", "1"))
# model width: the headline workload is f_maps=32 (the reference's canonical
# config). Wider models fill more MXU output lanes per GEMM (Cout=32 uses
# 32/128); the f_maps sweep quantifies how much of the per-voxel cost is the
# workload's shape rather than the framework (BENCH_NOTES r3).
FMAPS = int(os.environ.get("P3DUNET_BENCH_FMAPS", "32"))
# EMA of the weights (trainer.ema_decay): adds one params-sized tree_map to
# every step; the knob measures its real cost on-chip
EMA = os.environ.get("P3DUNET_BENCH_EMA", "0") == "1"
# patches per forward in the predict sweep (DeviceSlidingWindow patch_batch).
# The 2D sweep gained 25% from batching z-slices (BENCH_NOTES r3); this knob
# measures the 3D analogue.
PATCH_BATCH = int(os.environ.get("P3DUNET_BENCH_PATCH_BATCH", "1"))
# per-compile XLA options (JSON dict) passed to jax.jit(compiler_options=...).
# The env-var XLA_FLAGS path is rejected by the axon plugin (BENCH_NOTES r3);
# this is the alternate plumbing the r3 verdict asked to try.
COMPILER_OPTIONS = json.loads(os.environ.get("P3DUNET_BENCH_COMPILER_OPTIONS", "null"))


def build_train_step(model_cfg=None, patch=None, batch=None):
    from pytorch3dunet_tpu.losses import BCEDiceLoss, SmoothL1Loss
    from pytorch3dunet_tpu.models import get_model
    from pytorch3dunet_tpu.utils.optim import create_optimizer

    if model_cfg is None:
        model_cfg = {
            "name": "UNet3D",
            "in_channels": 1,
            "out_channels": 1,
            "f_maps": FMAPS,
            "layer_order": "gcr",
            "num_groups": 8,
            "final_sigmoid": True,
            "dtype": "bfloat16",
            "remat": REMAT,
        }
    patch = PATCH if patch is None else patch
    batch = BATCH if batch is None else batch
    model_cfg = dict(model_cfg)
    lr = model_cfg.pop("_lr", 2e-4)
    clip = model_cfg.pop("_clip", None)
    loss_name = model_cfg.pop("_loss", "BCEDiceLoss")
    model = get_model(model_cfg)
    regression = loss_name == "SmoothL1Loss"
    loss_criterion = SmoothL1Loss() if regression else BCEDiceLoss()
    opt_cfg = {"name": "Adam", "learning_rate": lr}
    if os.environ.get("P3DUNET_BENCH_ADAM_MU"):  # e.g. bfloat16
        opt_cfg["mu_dtype"] = os.environ["P3DUNET_BENCH_ADAM_MU"]
    tx = create_optimizer(opt_cfg)
    if clip is not None:
        tx = optax.chain(optax.clip_by_global_norm(clip), tx)

    # jit the whole init: one dispatch instead of hundreds of eager ops
    # (the host<->device link is high-latency in this environment)
    rank = model.spatial_rank
    example = jnp.zeros((1,) + (16, 32, 32)[3 - rank :], dtype=jnp.float32)[..., None]
    variables = jax.jit(lambda rng, x: model.module.init(rng, x, train=False))(jax.random.PRNGKey(0), example)
    opt_state = tx.init(variables["params"])
    # mutable collections beyond params (BatchNorm batch_stats for 'b' orders)
    # advance through the scan carry, exactly like trainer._build_train_step
    mutable_keys = [k for k in variables if k != "params"]

    def microbatch_grads(variables, rng):
        # generate the batch on device: the benchmark measures compute, not
        # the host link (which is tunneled in this environment)
        kx, ky, kd = jax.random.split(rng, 3)
        x = jax.random.uniform(kx, (batch, *patch, 1), dtype=jnp.float32)
        if regression:  # denoising target: continuous, like the recipe's
            y = jax.random.uniform(ky, (batch, *patch, 1), dtype=jnp.float32)
        else:
            y = (jax.random.uniform(ky, (batch, *patch, 1)) > 0.5).astype(jnp.float32)
        aux_state = {k: v for k, v in variables.items() if k != "params"}

        def loss_fn(p):
            # train=True + dropout rng: literally the trainer's jitted step
            # (trainer.py _build_train_step); 'gcr' has no dropout layers but
            # the benchmarked program must match the production one.
            all_vars = {"params": p, **aux_state}
            if mutable_keys:
                (probs, logits), new_state = model.module.apply(
                    all_vars, x, train=True, rngs={"dropout": kd}, mutable=mutable_keys
                )
            else:
                probs, logits = model.module.apply(all_vars, x, train=True, rngs={"dropout": kd})
                new_state = {}
            return loss_criterion(logits, y), new_state

        (loss, new_state), grads = jax.value_and_grad(loss_fn, has_aux=True)(variables["params"])
        return loss, new_state, grads

    def train_step(carry, _):
        variables, opt_state, rng = carry
        rng, k0 = jax.random.split(rng)
        if ACCUM == 1:
            loss, new_state, grads = microbatch_grads(variables, k0)
        else:
            # trainer._accumulation_round's math: average k microbatch grads,
            # one optimizer update (each microbatch at the batch-1 sweet spot)
            losses, accs, new_state = [], None, {}
            for k in jax.random.split(k0, ACCUM):
                loss_k, new_state, g = microbatch_grads(variables, k)
                variables = {**variables, **new_state}
                losses.append(loss_k)
                accs = g if accs is None else jax.tree_util.tree_map(jnp.add, accs, g)
            grads = jax.tree_util.tree_map(lambda g: g / ACCUM, accs)
            loss = sum(losses) / ACCUM
        updates, new_opt_state = tx.update(grads, opt_state, variables["params"])
        new_params = optax.apply_updates(variables["params"], updates)
        new_variables = {**variables, "params": new_params, **new_state}
        return (new_variables, new_opt_state, rng), loss

    def train_step_ema(carry, _):
        variables, ema, opt_state, rng = carry
        (variables, opt_state, rng), loss = train_step((variables, opt_state, rng), None)
        d = 0.999  # trainer._ema_step's tree_map, fused into the scan body
        ema = jax.tree_util.tree_map(lambda e, p: d * e + (1.0 - d) * p, ema, variables["params"])
        return (variables, ema, opt_state, rng), loss

    def run_steps(variables, opt_state, rng, n):
        # N steps in one device program: a single dispatch, immune to the
        # host<->device tunnel latency of this environment
        if EMA:
            ema0 = jax.tree_util.tree_map(jnp.copy, variables["params"])
            (variables, ema, opt_state, rng), losses = jax.lax.scan(
                train_step_ema, (variables, ema0, opt_state, rng), None, length=n
            )
            # fold a hash of the EMA into the loss read so it cannot be DCE'd
            losses = losses + 0.0 * jax.tree_util.tree_leaves(ema)[0].ravel()[0]
        else:
            (variables, opt_state, rng), losses = jax.lax.scan(
                train_step, (variables, opt_state, rng), None, length=n
            )
        return variables, opt_state, losses[-1]

    return run_steps, variables, opt_state, (batch, patch)


def measure_train(model_cfg=None, patch=None, batch=None, n_steps=None):
    """One train leg: compile, warm, best-of-3 timed dispatches -> voxels/sec."""
    run_steps, variables, opt_state, (b, p) = build_train_step(model_cfg, patch, batch)
    n_steps = N_STEPS if n_steps is None else n_steps
    run = jax.jit(run_steps, static_argnums=(3,), donate_argnums=(0, 1),
                  compiler_options=COMPILER_OPTIONS)

    # warmup (compile); a different rng key than the timed run so no result
    # caching layer can alias the two computations
    variables, opt_state, loss = run(variables, opt_state, jax.random.PRNGKey(7), n_steps)
    _ = float(loss)

    # best-of-3: each timed region is one device-bound dispatch of n_steps
    # real steps; transient tunnel/host degradation only ever inflates dt, so
    # min(dt) measures the chip (a degraded sample once read 20% low —
    # BENCH_NOTES r4). Every repeat advances real state (donated params, new
    # rng key), so no caching layer can alias the dispatches.
    dt = float("inf")
    for seed in (42, 43, 44):
        t0 = time.perf_counter()
        variables, opt_state, loss = run(variables, opt_state, jax.random.PRNGKey(seed), n_steps)
        final_loss = float(loss)  # forces completion
        dt = min(dt, (time.perf_counter() - t0) / n_steps)
        assert np.isfinite(final_loss), f"non-finite loss: {final_loss}"
    return ACCUM * b * int(np.prod(p)) / dt


def measure_predict(vol=(128, 320, 320), patch=(64, 160, 160), halo=(8, 16, 16), n_sweeps: int = 5):
    """Sliding-window predict throughput (output voxels/sec/chip): the jitted
    device sweep (inference_device.DeviceSlidingWindow), Gaussian patch
    normalization, bf16 — the device counterpart of the reference's
    StandardPredictor loop (reference unet3d/predictor.py:112-193). The volume
    is generated ON DEVICE and N sweeps run per dispatch (tunnel-immune, same
    discipline as the train leg).

    Two geometries are measured (BENCH_NOTES r4 slab tables):
      - grid: the canonical patch grid (128x320x320 volume, 64x160x160
        patches, 8x16x16 halo — 1.8x redundant halo compute), reference-like
        patch decomposition.
      - slab (`predictor.patch_mode: slab`): full-xy z-slabs (512x320x320
        volume, two 256x320x320 slabs, halo 8x0x0 — z-only halo, 1.06x
        redundancy); no interior xy seams exist so no xy halo is needed.
        NOTE the deeper 288-slab leg (padded 304x320x320 = 31.1M, the
        probe-level capacity result) OOMs the compile inside THIS harness
        (22.16G estimated vs 15.75G hbm): the sweep scan holds the full
        padded volume + output + weight accumulators resident alongside the
        slab forward, which the single-resident-slab capacity probe did not
        (BENCH_NOTES r5 capacity addendum) — so the shipping leg stays at
        the 272-padded/27.8M geometry that measures 78.4 Mvox/s here.
    """
    from pytorch3dunet_tpu.inference_device import DeviceSlidingWindow
    from pytorch3dunet_tpu.models import get_model

    model = get_model({
        "name": "UNet3D", "in_channels": 1, "out_channels": 1, "f_maps": FMAPS,
        "layer_order": "gcr", "num_groups": 8, "final_sigmoid": True,
        "dtype": "bfloat16",
    })
    variables = jax.jit(
        lambda rng, x: model.module.init(rng, x, train=False)
    )(jax.random.PRNGKey(0), jnp.zeros((1, 16, 32, 32, 1), jnp.float32))

    padded_shape = tuple(v + 2 * h for v, h in zip(vol, halo))
    zs = list(range(0, vol[0] - patch[0] + 1, patch[0]))
    ys = list(range(0, vol[1] - patch[1] + 1, patch[1]))
    xs = list(range(0, vol[2] - patch[2] + 1, patch[2]))
    starts = jnp.asarray([(z, y, x) for z in zs for y in ys for x in xs], jnp.int32)
    sweep = DeviceSlidingWindow(model, patch_shape=patch, halo_shape=halo,
                                normalize="standardize_patch", patch_batch=PATCH_BATCH)
    stats = sweep._stats_pytree()

    @jax.jit
    def run(seed):
        def body(carry, _):
            acc, key = carry
            key, k = jax.random.split(key)
            vol_dev = jax.random.uniform(k, (*padded_shape, 1), dtype=jnp.float32)
            out, _w = sweep._accumulate(variables, vol_dev, starts,
                                        weighted=sweep.weighted, stats=stats)
            return (acc + jnp.sum(out[0, 0, :4, 0]), key), None

        (acc, _), _ = jax.lax.scan(body, (jnp.float32(0), seed), None, length=n_sweeps)
        return acc

    _ = float(run(jax.random.PRNGKey(3)))  # compile + warm
    # best-of-3: each timed region is one device-bound dispatch; transient
    # tunnel/host degradation only ever inflates dt, so min(dt) measures the
    # chip (a degraded sample once read 35% low — BENCH_NOTES r4)
    dt = np.inf
    for i, seed in enumerate((11, 13, 17)):
        t0 = time.perf_counter()
        acc = float(run(jax.random.PRNGKey(seed)))
        dt = min(dt, (time.perf_counter() - t0) / n_sweeps)
        assert np.isfinite(acc), f"non-finite predict accumulator: {acc}"
    return int(np.prod(vol)) / dt


def main():
    if BENCH_MODEL != "unet3d":
        # single-family raw-measurement mode (BENCH_NOTES r5 family table)
        cfg, patch, batch = FAMILY_PRESETS[BENCH_MODEL]
        vps = measure_train(cfg, patch, batch)
        matched = A100_REFERENCE_VOXELS_PER_SEC * (
            FAMILY_MFLOP_PER_VOX["unet3d"] / FAMILY_MFLOP_PER_VOX[BENCH_MODEL]
        )
        print(json.dumps({
            "metric": f"{BENCH_MODEL} train voxels/sec/chip (bf16)",
            "value": round(vps, 1), "unit": "voxels/sec",
            "vs_baseline": round(vps / matched, 3),
            "effective_tflops": round(vps * FAMILY_MFLOP_PER_VOX[BENCH_MODEL] / 1e6, 1),
        }))
        return

    voxels_per_sec = measure_train()

    result = {
        "metric": f"UNet3D train + sliding-window predict voxels/sec/chip (f_maps={FMAPS}, bf16)",
        "value": round(voxels_per_sec, 1),
        "unit": "voxels/sec",
        "vs_baseline": round(voxels_per_sec / A100_REFERENCE_VOXELS_PER_SEC, 3),
        "train": round(voxels_per_sec, 1),
    }
    # BASELINE.json's metric is train + sliding-window predict: the artifact
    # carries both. The predict denominator is the A100 estimate for the
    # reference's forward-only sweep at its canonical geometry's 1.8x halo
    # redundancy (0.46 MFLOP/vox * 1.8 at 55 TF/s ~= 67 Mvox/s — BENCH_NOTES
    # "Baseline"); both of our geometries predict the same task (a halo'd
    # sliding window over a volume), measured in OUTPUT voxels/sec.
    if os.environ.get("P3DUNET_BENCH_PREDICT", "1") == "1":
        # headline: the slab geometry (predictor.patch_mode: slab) — full-xy
        # z-slabs, z-only halo; no interior xy seams exist, so no xy halo is
        # needed (the reference's own default halo is zero, hdf5.py:93).
        # Each leg degrades gracefully (omitted field) rather than failing
        # the whole artifact.
        import sys

        for name, kwargs in (
            ("predict", dict(vol=(512, 320, 320), patch=(256, 320, 320), halo=(8, 0, 0))),
            ("predict_grid", {}),
        ):
            try:
                vps = measure_predict(**kwargs)
                result[name] = round(vps, 1)
                result[f"{name}_vs_baseline"] = round(vps / 67e6, 3)
            except Exception as e:  # noqa: BLE001 — a leg must not sink the artifact
                print(f"predict leg {name} failed: {e}", file=sys.stderr)
    # model-family train legs (r4 verdict #1): every earlier TPU number was
    # UNet3D-only; record ResidualUNet3D / ResidualUNetSE3D / UNet2D-train
    # throughput at their canonical recipe shapes. Each leg degrades
    # gracefully (omitted field) rather than failing the whole artifact.
    if os.environ.get("P3DUNET_BENCH_FAMILIES", "1") == "1":
        for fam in ("resunet3d", "resunetse3d", "unet2d", "denoise3d"):
            cfg, patch, batch = FAMILY_PRESETS[fam]
            try:
                fam_vps = measure_train(cfg, patch, batch)
                result[f"train_{fam}"] = round(fam_vps, 1)
                matched = A100_REFERENCE_VOXELS_PER_SEC * (
                    FAMILY_MFLOP_PER_VOX["unet3d"] / FAMILY_MFLOP_PER_VOX[fam]
                )
                result[f"train_{fam}_vs_baseline"] = round(fam_vps / matched, 3)
            except Exception as e:  # noqa: BLE001 — a family leg must not sink the artifact
                import sys

                print(f"family leg {fam} failed: {e}", file=sys.stderr)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
