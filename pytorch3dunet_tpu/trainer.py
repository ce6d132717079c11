"""Iteration-driven trainer with a jitted SPMD train step.

Workflow parity with the reference UNetTrainer
(pytorch3dunet/unet3d/trainer.py): iteration-counted epochs, periodic
validation with best-checkpoint tracking, LR scheduling (ReduceLROnPlateau
stepped on the eval score), TensorBoard scalars/images, stop on max-iterations
or lr < 1e-6, and checkpoint/resume with counters.

TPU-first design differences:
- the train step is one jitted function (forward + loss-on-logits + backward +
  optimizer update) with donated state, compiled once per batch shape;
- the global batch is sharded over a 1-D device mesh ('data' axis); XLA
  inserts the gradient psum over ICI (replacing nn.DataParallel);
- host-side work (metric eval, TB logging, checkpointing) overlaps with device
  compute thanks to the threaded prefetch loader and JAX's async dispatch.
"""

import os
from datetime import datetime

import jax
import jax.numpy as jnp
import numpy as np
import optax
from tensorboardX import SummaryWriter

from pytorch3dunet_tpu.datasets.utils import get_train_loaders
from pytorch3dunet_tpu.losses import get_loss_criterion
from pytorch3dunet_tpu.metrics import get_evaluation_metric, to_metric_layout
from pytorch3dunet_tpu.models import get_model, is_model_2d
from pytorch3dunet_tpu.parallel import choose_data_mesh, replicate, shard_batch
from pytorch3dunet_tpu.utils import RunningAverage, TensorboardFormatter, get_logger
from pytorch3dunet_tpu.utils.checkpoint import load_checkpoint, save_checkpoint, tree_leaves_list
from pytorch3dunet_tpu.utils.optim import OptimizerHandle, create_lr_scheduler, create_optimizer, get_lr, set_lr

logger = get_logger("UNetTrainer")

_UNSET = object()  # device_metric_fn resolution sentinel (None is a valid result)


def create_trainer(config: dict) -> "UNetTrainer":
    """Builds a UNetTrainer from a full config dict (reference: trainer.py:32-78)."""
    model = get_model(config["model"])

    device = config.get("device", None)
    assert device, "Device not specified in the config file and could not be inferred automatically"
    logger.info(f"Using device: {device}")

    loss_criterion = get_loss_criterion(config)
    eval_criterion = get_evaluation_metric(config)

    # optional device-side augmentation: strip movable transforms from the
    # host pipeline and run them batched on the accelerator instead
    from pytorch3dunet_tpu.ops.augment import DeviceAugmenter, split_device_transforms

    device_aug_spec = split_device_transforms(config["loaders"])
    device_augmenter = DeviceAugmenter(device_aug_spec) if device_aug_spec else None
    if device_augmenter is not None:
        post = device_aug_spec.get("label_post")
        logger.info(
            f"Device augmentation: {len(device_aug_spec['paired'])} paired + "
            f"{len(device_aug_spec['raw_only'])} raw-only transforms moved on-device"
            + (f" + label engineering ({post['name']})" if post else "")
        )

    loaders = get_train_loaders(config)

    optimizer_config = config["optimizer"]

    trainer_config = dict(config["trainer"])
    tensorboard_formatter = TensorboardFormatter(**trainer_config.pop("tensorboard_formatter", {}))
    resume = trainer_config.pop("resume", None)
    pre_trained = trainer_config.pop("pre_trained", None)

    return UNetTrainer(
        model=model,
        optimizer_config=optimizer_config,
        lr_scheduler_config=config.get("lr_scheduler", None),
        loss_criterion=loss_criterion,
        eval_criterion=eval_criterion,
        loaders=loaders,
        tensorboard_formatter=tensorboard_formatter,
        resume=resume,
        pre_trained=pre_trained,
        device=device,
        seed=config.get("manual_seed", None),
        device_augmenter=device_augmenter,
        **trainer_config,
    )


class UNetTrainer:
    """Trains a UNetModel (see module docstring for the design notes).

    Args mirror the reference trainer (trainer.py:93-205); `optimizer_config`
    and `lr_scheduler_config` replace the torch optimizer/scheduler objects.
    """

    def __init__(self, model, optimizer_config, lr_scheduler_config, loss_criterion, eval_criterion, loaders,
                 checkpoint_dir, max_num_epochs, max_num_iterations, validate_after_iters=200, log_after_iters=100,
                 validate_iters=None, num_iterations=1, num_epoch=0, eval_score_higher_is_better=True,
                 tensorboard_formatter=None, skip_train_validation=False, resume=None, pre_trained=None,
                 max_val_images=100, device=None, seed=None, profile_dir=None, log_params=False,
                 device_augmenter=None, spatial_sharding=False, async_steps=8, grad_accum_steps=1,
                 ema_decay=None, async_checkpoint=True):
        self.model = model
        self.loss_criterion = loss_criterion
        self.eval_criterion = eval_criterion
        self.loaders = loaders
        self.checkpoint_dir = checkpoint_dir
        self.max_num_epochs = max_num_epochs
        self.max_num_iterations = max_num_iterations
        self.validate_after_iters = validate_after_iters
        self.log_after_iters = log_after_iters
        self.validate_iters = validate_iters
        self.eval_score_higher_is_better = eval_score_higher_is_better
        self.skip_train_validation = skip_train_validation
        self.max_val_images = max_val_images
        self.device = device
        # spatial model parallelism: shard the patch's D axis across chips
        # with halo-exchanged convs (parallel/spatial.py) — multi-chip speedup
        # even at batch 1, which data parallelism cannot give
        self.spatial_sharding = spatial_sharding
        # gradient accumulation: k microbatches per optimizer update. On v5e
        # batch 2 is slower per-voxel than batch 1 (HBM locality, BENCH_NOTES
        # r3) — accumulation gives the effective batch without that wall.
        self.grad_accum_steps = max(1, int(grad_accum_steps))
        self._accum_fns = None
        # exponential moving average of the weights (no reference counterpart):
        # validation, best-checkpoint selection, and prediction use the EMA
        # params; the raw params keep training. One params-sized tree_map per
        # step (~20 MB traffic for f_maps=32 — noise next to the step itself).
        if ema_decay is not None and not (0.0 < float(ema_decay) < 1.0):
            raise ValueError(f"trainer.ema_decay must be in (0, 1); got {ema_decay}")
        self.ema_decay = None if ema_decay is None else float(ema_decay)
        if self.ema_decay is not None:
            logger.info(f"EMA of the weights enabled (decay={self.ema_decay}): "
                        "validation/checkpoints/prediction use the averaged weights")
        self.ema_params = None
        self._ema_update_fn = None

        logger.info(f"eval_score_higher_is_better: {eval_score_higher_is_better}")
        self.best_eval_score = float("-inf") if eval_score_higher_is_better else float("+inf")

        # multi-host: each process gets its own TB run dir (no file clashes);
        # checkpoints are written by process 0 only (_save_checkpoint)
        run_name = datetime.now().strftime("%Y-%m-%d_%H-%M-%S")
        if jax.process_count() > 1 and jax.process_index() != 0:
            run_name = f"{run_name}_proc{jax.process_index()}"
        self.writer = SummaryWriter(log_dir=os.path.join(checkpoint_dir, "logs", run_name))
        assert tensorboard_formatter is not None, "TensorboardFormatter must be provided"
        self.tensorboard_formatter = tensorboard_formatter

        self.num_iterations = num_iterations
        self.num_epochs = num_epoch

        # optimizer: the lr lives in the optax state (inject_hyperparams); the
        # handle gives schedulers a torch-shaped view over it
        self.tx = create_optimizer(optimizer_config)
        self.lr_handle = OptimizerHandle(optimizer_config.get("learning_rate", 1e-3))
        self.scheduler = create_lr_scheduler(lr_scheduler_config, self.lr_handle)

        # device mesh for data parallelism, sized from the first batch
        self.mesh = None

        # model/opt state are initialized lazily from the first batch shape
        self.variables = None
        self.opt_state = None
        # resume: auto — pick up last_checkpoint.pytorch when it exists, start
        # fresh otherwise. Preemptible-TPU friendly: the SAME config restarts
        # a killed run without editing the resume path in and out.
        if resume == "auto":
            auto_path = os.path.join(checkpoint_dir, "last_checkpoint.pytorch")
            if os.path.exists(auto_path):
                logger.info(f"resume: auto -> found {auto_path}")
                resume = auto_path
            else:
                logger.info(f"resume: auto -> no checkpoint at {auto_path}, starting fresh")
                resume = None
        self._pending_resume = resume
        self._pending_pre_trained = pre_trained
        self._resume_meta_done = False
        self._rng = jax.random.PRNGKey(seed if seed is not None else 0)
        self._train_step_fn = None
        self._eval_step_fn = None
        self._grad_fn = None
        self._device_metric_fn = _UNSET
        # TB image writes overlap with the next train step (reference uses a
        # thread pool the same way, trainer.py:343-345)
        from concurrent.futures import ThreadPoolExecutor

        self._image_executor = ThreadPoolExecutor(max_workers=2, thread_name_prefix="tb-images")
        self._image_futures = []
        # async checkpointing: the save snapshots the state ON DEVICE (one
        # jitted tree-copy — cheap HBM traffic, and the copies own their
        # buffers so the next step's donation can't invalidate them), then a
        # background thread pulls the snapshot to host, serializes, and writes
        # — training never waits on the device->host transfer or the npz
        # compression. `trainer.async_checkpoint: false` restores the
        # synchronous save.
        self.async_checkpoint = bool(async_checkpoint)
        self._ckpt_executor = ThreadPoolExecutor(max_workers=1, thread_name_prefix="ckpt")
        self._ckpt_future = None
        self._snapshot_fn = None

        if resume is not None:
            self.checkpoint_dir = os.path.split(resume)[0]
        elif pre_trained is not None and not self.checkpoint_dir:
            self.checkpoint_dir = os.path.split(pre_trained)[0]

        self.device_augmenter = device_augmenter

        # observability: optional jax.profiler traces + per-step throughput
        self.profile_dir = profile_dir
        self.log_params = log_params
        self._profiling = False
        self._step_voxels = RunningAverage()

        # async step accounting: reading the loss scalar synchronizes the
        # device, so per-iteration float(loss) serializes the pipeline on a
        # high-latency host<->device link. Losses stay device futures and are
        # flushed every `async_steps` iterations (and at every log/validate
        # boundary), keeping up to that many steps in flight.
        self.async_steps = max(1, int(async_steps))
        self._pending_losses: list = []
        self._window_voxels = 0.0
        self._window_t0 = None

    # ------------------------------------------------------------------ setup

    def _resolve_resume_meta(self):
        """Applies the resume checkpoint's counters/PRNG key EAGERLY.

        fit() sizes its epoch range from `num_epochs` and `_train_groups`
        keys the shuffle from it; the weights load lazily with the first
        batch (`_ensure_initialized`), which is too late for either — a
        resumed run would train `max_num_epochs` EXTRA epochs and replay the
        wrong batch order. The weight/optimizer restore stays lazy (it needs
        the initialized templates); counters are read here, idempotently.
        """
        if self._resume_meta_done or self._pending_resume is None:
            return
        self._resume_meta_done = True
        state = load_checkpoint(self._pending_resume)
        self.num_iterations = state["num_iterations"]
        self.num_epochs = state["num_epochs"]
        if state.get("best_eval_score") is not None:
            self.best_eval_score = state["best_eval_score"]
        if state.get("rng_state") is not None:
            # the npz round-trip stores the key as a one-leaf pytree
            # (list of arrays): normalize back to a raw (2,) uint32 key
            self._rng = jnp.asarray(np.asarray(state["rng_state"]).reshape(2))

    def _ensure_initialized(self, example_input: np.ndarray):
        if self.variables is not None:
            return
        init_rng, self._rng = jax.random.split(self._rng)
        # jit: eager flax init dispatches each op separately — seconds per op
        # over a tunneled TPU (CLAUDE.md)
        init_fn = jax.jit(lambda rng, x: self.model.module.init(rng, x, train=False))
        self.variables = init_fn(init_rng, jnp.asarray(example_input[:1]))
        self.opt_state = self.tx.init(self.variables["params"])

        n_params = sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(self.variables["params"]))
        logger.info(f"Number of learnable params {n_params}")

        resumed_ema_leaves = None
        if self._pending_resume is not None:
            logger.info(f"Loading checkpoint '{self._pending_resume}'...")
            state = load_checkpoint(self._pending_resume, self.variables, self.opt_state)
            self.variables = state["model_state_dict"]
            resumed_ema_leaves = state.get("ema_state_dict")
            if state.get("optimizer_state_dict") is not None:
                self.opt_state = state["optimizer_state_dict"]
                self.lr_handle.lr = get_lr(self.opt_state)
            else:
                # torch-format checkpoints carry no optax state: resume the
                # weights/counters with a freshly initialized optimizer
                logger.warning("Checkpoint has no optimizer state (torch format?); optimizer starts fresh")
                self.opt_state = self.tx.init(self.variables["params"])
            if state["best_eval_score"] is not None:
                self.best_eval_score = state["best_eval_score"]
            self.num_iterations = state["num_iterations"]
            self.num_epochs = state["num_epochs"]
            if state.get("rng_state") is not None:
                # the npz round-trip stores the key as a one-leaf pytree
                # (list of arrays): normalize back to a raw (2,) uint32 key
                self._rng = jnp.asarray(np.asarray(state["rng_state"]).reshape(2))
            logger.info(
                f"Checkpoint loaded from '{self._pending_resume}'. Epoch: {state['num_epochs']}. "
                f"Iteration: {state['num_iterations']}. Best val score: {state['best_eval_score']}."
            )
            self._pending_resume = None
        elif self._pending_pre_trained is not None:
            logger.info(f"Loading pre-trained model from '{self._pending_pre_trained}'...")
            state = load_checkpoint(self._pending_pre_trained, self.variables, None)
            self.variables = state["model_state_dict"]
            self._pending_pre_trained = None

        # replicate state across the data mesh
        self.variables = replicate(self.mesh, self.variables)
        self.opt_state = replicate(self.mesh, self.opt_state)

        if self.ema_decay is not None:
            if resumed_ema_leaves:
                from pytorch3dunet_tpu.utils.checkpoint import restore_tree

                logger.info("Restoring EMA weights from the checkpoint")
                ema = restore_tree(jax.device_get(self.variables["params"]), resumed_ema_leaves)
                self.ema_params = replicate(self.mesh, ema)
            else:
                # fresh copy (the train step DONATES the params buffers, so the
                # EMA tree must own its storage from the start)
                self.ema_params = jax.jit(
                    lambda p: jax.tree_util.tree_map(jnp.copy, p)
                )(self.variables["params"])

    def _build_train_step(self):
        model = self.model
        loss_criterion = self.loss_criterion
        tx = self.tx
        mutable_keys = [k for k in (self.variables or {}) if k != "params"]

        if self.spatial_sharding:
            from pytorch3dunet_tpu.parallel.spatial import build_spatial_train_step

            return build_spatial_train_step(model, loss_criterion, tx, self.mesh, mutable_keys)

        def step(variables, opt_state, rng, inp, target):
            aux_state = {k: v for k, v in variables.items() if k != "params"}

            def loss_fn(params):
                all_vars = {"params": params, **aux_state}
                if mutable_keys:
                    (probs, logits), new_state = model.module.apply(
                        all_vars, inp, train=True, rngs={"dropout": rng}, mutable=mutable_keys
                    )
                else:
                    probs, logits = model.module.apply(all_vars, inp, train=True, rngs={"dropout": rng})
                    new_state = {}
                loss = loss_criterion(logits, target)
                return loss, (probs, new_state)

            (loss, (probs, new_state)), grads = jax.value_and_grad(loss_fn, has_aux=True)(variables["params"])
            updates, new_opt_state = tx.update(grads, opt_state, variables["params"])
            new_params = optax.apply_updates(variables["params"], updates)
            new_variables = {"params": new_params, **aux_state, **new_state}
            return new_variables, new_opt_state, loss, probs

        return jax.jit(step, donate_argnums=(0, 1))

    def _build_accum_fns(self):
        """Gradient-accumulation twins of the train step.

        `grads_step` runs forward+backward on one microbatch and adds its
        gradients into a device-resident accumulator (no optimizer update);
        `apply_step` averages the accumulator over k microbatches and applies
        one optimizer update. Matches torch-style sequential accumulation:
        mutable model state (e.g. BatchNorm stats) advances per microbatch,
        losses are per-microbatch.
        """
        model = self.model
        loss_criterion = self.loss_criterion
        tx = self.tx
        k = self.grad_accum_steps
        mutable_keys = [key for key in (self.variables or {}) if key != "params"]

        if self.spatial_sharding:
            from pytorch3dunet_tpu.parallel.spatial import build_spatial_accum_fns

            return build_spatial_accum_fns(model, loss_criterion, tx, self.mesh, k, mutable_keys)

        def grads_step(variables, rng, inp, target, acc):
            aux_state = {key: v for key, v in variables.items() if key != "params"}

            def loss_fn(params):
                all_vars = {"params": params, **aux_state}
                if mutable_keys:
                    (probs, logits), new_state = model.module.apply(
                        all_vars, inp, train=True, rngs={"dropout": rng}, mutable=mutable_keys
                    )
                else:
                    probs, logits = model.module.apply(all_vars, inp, train=True, rngs={"dropout": rng})
                    new_state = {}
                loss = loss_criterion(logits, target)
                return loss, (probs, new_state)

            (loss, (probs, new_state)), grads = jax.value_and_grad(loss_fn, has_aux=True)(variables["params"])
            new_acc = jax.tree_util.tree_map(jnp.add, acc, grads)
            new_variables = {"params": variables["params"], **aux_state, **new_state}
            return new_variables, new_acc, loss, probs

        def apply_step(variables, opt_state, acc):
            grads = jax.tree_util.tree_map(lambda g: g / k, acc)
            updates, new_opt_state = tx.update(grads, opt_state, variables["params"])
            new_params = optax.apply_updates(variables["params"], updates)
            return {**variables, "params": new_params}, new_opt_state

        zeros = jax.jit(lambda params: jax.tree_util.tree_map(jnp.zeros_like, params))
        return (
            jax.jit(grads_step, donate_argnums=(4,)),
            jax.jit(apply_step, donate_argnums=(0, 1, 2)),
            zeros,
        )

    def _ema_step(self):
        """Folds the post-update params into the EMA tree (one jitted tree_map)."""
        if self._ema_update_fn is None:
            d = self.ema_decay

            def update(ema, params):
                return jax.tree_util.tree_map(lambda e, p: d * e + (1.0 - d) * p.astype(e.dtype), ema, params)

            self._ema_update_fn = jax.jit(update, donate_argnums=(0,))
        self.ema_params = self._ema_update_fn(self.ema_params, self.variables["params"])

    def _eval_variables(self):
        """Variables the eval/validation step runs with: EMA weights when on."""
        if self.ema_params is None:
            return self.variables
        return {**self.variables, "params": self.ema_params}

    def _build_eval_step(self):
        model = self.model
        loss_criterion = self.loss_criterion

        if self.spatial_sharding:
            from pytorch3dunet_tpu.parallel.spatial import build_spatial_eval_step

            return build_spatial_eval_step(model, loss_criterion, self.mesh)

        def step(variables, inp, target):
            probs, logits = model.module.apply(variables, inp, train=False)
            return probs, loss_criterion(logits, target)

        return jax.jit(step)

    # --------------------------------------------------------------- batching

    def _prepare_batch(self, raw: np.ndarray, target: np.ndarray, augment: bool = False,
                       ragged_ok: bool = False):
        """(N, C, [D,] H, W) loader batch -> channels-last device layout.

        `ragged_ok`: multi-host only — vouches that a non-divisible batch is
        host-identical (validation batches over the shared val files), so
        replicating it is sound. Train batches must never set this (the
        drop_last/global-min capping guarantees divisibility instead).
        """
        inp = np.moveaxis(np.asarray(raw), 1, -1)
        target = np.asarray(target)
        if target.ndim == raw.ndim:
            target = np.moveaxis(target, 1, -1)

        if augment and self.device_augmenter is not None:
            aug_key, self._rng = jax.random.split(self._rng)
            label_has_channel = target.ndim == inp.ndim
            tgt = target if label_has_channel else target[..., None]
            inp, tgt = self.device_augmenter(aug_key, jnp.asarray(inp), jnp.asarray(tgt))
            target = tgt if label_has_channel else tgt[..., 0]

        if is_model_2d(self.model):
            # strip the singleton z-dim (reference trainer.py:352-359);
            # indexing works for numpy and (post-augment) jax arrays alike
            inp = inp[:, 0]
            target = target[:, 0]
        if self.spatial_sharding:
            from pytorch3dunet_tpu.parallel.spatial import (
                choose_space_mesh, shard_spatial_batch, spatial_min_local, spatial_pool_d,
                validate_spatial_model,
            )

            assert not is_model_2d(self.model), "spatial_sharding requires a 3D model"
            if self.mesh is None:
                validate_spatial_model(self.model)
                self.mesh = choose_space_mesh(inp.shape[1], len(self.model.f_maps),
                                              min_local=spatial_min_local(self.model),
                                              pool=spatial_pool_d(self.model))
                logger.info(f"Spatial mesh: patch D axis sharded over {self.mesh.devices.size} device(s)")
            return shard_spatial_batch(self.mesh, (inp, target))
        if self.mesh is None:
            self.mesh = choose_data_mesh(inp.shape[0])
            logger.info(f"Data-parallel mesh: {self.mesh.devices.size} device(s)")
        inp, target = shard_batch(self.mesh, (inp, target), ragged_replicated_ok=ragged_ok)
        return inp, target

    @staticmethod
    def _batch_size(batch) -> int:
        if isinstance(batch, (list, tuple)):
            return batch[0].shape[0]
        return batch.shape[0]

    @staticmethod
    def _local_np(x):
        """Global device array -> host numpy. Multi-host batch-sharded arrays
        are assembled from this host's addressable shards only (each host
        evaluates metrics on its own samples; np.asarray on a
        non-fully-addressable array would raise)."""
        if not isinstance(x, jax.Array) or x.is_fully_replicated or x.is_fully_addressable:
            return np.asarray(x)
        uniq = {s.index[0].start or 0: s for s in x.addressable_shards}
        return np.concatenate([np.asarray(uniq[k].data) for k in sorted(uniq)], axis=0)

    def _metric_inputs(self, probs, target):
        """Converts device outputs to the channels-first metric layout."""
        out_np, tar_np = to_metric_layout(self._local_np(probs), self._local_np(target),
                                          is3d=not is_model_2d(self.model))
        return out_np, tar_np

    # ------------------------------------------------------------------- fit

    def fit(self):
        self._resolve_resume_meta()  # BEFORE the range() below sees num_epochs
        try:
            for _ in range(self.num_epochs, self.max_num_epochs):
                should_terminate = self.train()
                if should_terminate:
                    logger.info("Stopping criterion is satisfied. Finishing training")
                    return
                self.num_epochs += 1
            logger.info(f"Reached maximum number of epochs: {self.max_num_epochs}. Finishing training...")
        except KeyboardInterrupt:
            # interruption-safe: persist progress so the run can resume
            if self.variables is not None:
                logger.info("Interrupted: saving checkpoint before exiting")
                self._save_checkpoint(is_best=False)
            raise
        finally:
            # drain the in-flight checkpoint save and pending TB image writes
            # (and surface their exceptions)
            self._wait_checkpoint()
            for future in self._image_futures:
                future.result()
            self._image_futures = []
            if self._profiling:
                jax.profiler.stop_trace()
                self._profiling = False
                logger.info(f"Profiler trace written to {self.profile_dir}")

    def train(self):
        """Trains for one epoch; returns True if training should stop now."""
        self._resolve_resume_meta()  # no-op under fit(); direct train() callers
        train_losses = RunningAverage()
        train_eval_scores = RunningAverage()

        if self.profile_dir and not self._profiling:
            # capture a device trace of this epoch (tracing aux subsystem)
            jax.profiler.start_trace(self.profile_dir)
            self._profiling = True

        import time as _time

        def flush_pending():
            """Synchronizes and folds all in-flight step losses + throughput."""
            if not self._pending_losses:
                return
            for pending_loss, pending_bs in self._pending_losses:
                train_losses.update(float(pending_loss), pending_bs)
            self._pending_losses.clear()
            if self._window_t0 is not None and self._window_voxels:
                self._step_voxels.update(self._window_voxels / (_time.perf_counter() - self._window_t0))
            self._window_voxels = 0.0
            self._window_t0 = _time.perf_counter()

        for group in self._train_groups():
            logger.info(
                f"Training iteration [{self.num_iterations}/{self.max_num_iterations}]. "
                f"Epoch [{self.num_epochs}/{self.max_num_epochs - 1}]"
            )
            if self._window_t0 is None:
                self._window_t0 = _time.perf_counter()
            # logging/metrics read the LAST microbatch of the group (for the
            # default grad_accum_steps=1 the group is the whole batch)
            raw, target_host = group[-1]

            if len(group) == 1:
                inp, target = self._prepare_batch(raw, target_host, augment=True)
                self._ensure_initialized(inp)
                if self._train_step_fn is None:
                    self._train_step_fn = self._build_train_step()
                # keep the scheduler-adjusted lr inside the donated optimizer state
                self.opt_state = set_lr(self.opt_state, self.lr_handle.lr)
                step_rng, self._rng = jax.random.split(self._rng)
                self.variables, self.opt_state, loss, probs = self._train_step_fn(
                    self.variables, self.opt_state, step_rng, inp, target
                )
                # losses stay device futures; they flush in bulk so up to
                # async_steps iterations overlap (transfer + compute pipelined)
                self._pending_losses.append((loss, self._batch_size(raw)))
                self._window_voxels += int(np.prod(raw.shape)) // raw.shape[1]  # N*D*H*W
            else:
                inp, target, probs, step_rng = self._accumulation_round(group)

            if self.ema_decay is not None:
                self._ema_step()

            batch_size = self._batch_size(raw)
            if (
                len(self._pending_losses) >= self.async_steps
                or self.num_iterations % self.validate_after_iters == 0
                or self.num_iterations % self.log_after_iters == 0
            ):
                flush_pending()

            if self.num_iterations % self.validate_after_iters == 0:
                eval_score = self.validate()

                if self.scheduler is not None:
                    if type(self.scheduler).__name__ == "ReduceLROnPlateau":
                        self.scheduler.step(eval_score)
                    else:
                        self.scheduler.step()

                self._log_lr()
                is_best = self._is_best_eval_score(eval_score)
                self._save_checkpoint(is_best)

            if self.num_iterations % self.log_after_iters == 0:
                out_np, tar_np = self._metric_inputs(probs, target)
                if not self.skip_train_validation:
                    eval_score = self.eval_criterion(out_np, tar_np)
                    train_eval_scores.update(float(eval_score), batch_size)

                logger.info(
                    f"Training stats. Loss: {train_losses.avg}. Evaluation score: {train_eval_scores.avg}. "
                    f"Throughput: {self._step_voxels.avg / 1e6:.2f} Mvoxels/s"
                )
                self._log_stats("train", train_losses.avg, train_eval_scores.avg)
                self.writer.add_scalar("train_voxels_per_sec", self._step_voxels.avg, self.num_iterations)
                if self.device_augmenter is not None:
                    # log the batch the network actually saw: with device-side
                    # augmentation the host arrays are PRE-augmentation, so the
                    # logged targets would not match the logged predictions
                    raw_log = np.moveaxis(self._local_np(inp), -1, 1)
                    tgt_np = self._local_np(target)
                    target_log = np.moveaxis(tgt_np, -1, 1) if tgt_np.ndim == raw_log.ndim else tgt_np
                else:
                    raw_log, target_log = np.asarray(raw), np.asarray(target_host)
                self._log_images(raw_log, target_log, out_np, "train_")
                if self.log_params:
                    if self._grad_fn is None:
                        self._grad_fn = self._build_grad_fn()
                    grads = self._grad_fn(self.variables, step_rng, inp, target)
                    self._log_params(grads)

            if (self.num_iterations % self.validate_after_iters == 0
                    or self.num_iterations % self.log_after_iters == 0):
                # validation/logging time must not count against the next
                # throughput window; the loop head re-arms the timer
                self._window_t0 = None

            if self.should_stop():
                flush_pending()
                return True

            self.num_iterations += 1

        # don't leak this epoch's in-flight losses into the next epoch's
        # stats, and don't charge inter-epoch dead time to its first window
        flush_pending()
        self._window_t0 = None
        return False

    def _train_groups(self):
        """Yields tuples of `grad_accum_steps` loader batches per iteration.

        A trailing group smaller than k is dropped (an optimizer update over
        fewer microbatches would change the effective batch mid-training; the
        global-min epoch capping keeps the drop host-consistent multi-host).
        """
        train_loader = self.loaders["train"]
        if hasattr(train_loader, "set_epoch"):
            # epoch-keyed shuffle: a resumed run replays the same batch order
            # the uninterrupted run used at this epoch (exact-resume support)
            train_loader.set_epoch(self.num_epochs)
        it = iter(train_loader)
        k = self.grad_accum_steps
        if k == 1:
            for t in it:
                yield (t,)
            return
        import itertools

        while True:
            group = tuple(itertools.islice(it, k))
            if len(group) < k:
                if group:
                    logger.info(f"Dropping trailing {len(group)} microbatch(es) short of "
                                f"grad_accum_steps={k} at epoch end")
                return
            yield group

    def _accumulation_round(self, group):
        """One optimizer update from k accumulated microbatch gradients."""
        acc = None
        inp = target = probs = step_rng = None
        for raw, target_host in group:
            inp, target = self._prepare_batch(raw, target_host, augment=True)
            self._ensure_initialized(inp)
            if self._accum_fns is None:
                self._accum_fns = self._build_accum_fns()
            grads_step, _, zeros = self._accum_fns
            if acc is None:
                acc = zeros(self.variables["params"])
            step_rng, self._rng = jax.random.split(self._rng)
            self.variables, acc, loss, probs = grads_step(self.variables, step_rng, inp, target, acc)
            self._pending_losses.append((loss, self._batch_size(raw)))
            self._window_voxels += int(np.prod(raw.shape)) // raw.shape[1]
        _, apply_step, _ = self._accum_fns
        # scheduler-adjusted lr goes into the donated optimizer state
        self.opt_state = set_lr(self.opt_state, self.lr_handle.lr)
        self.variables, self.opt_state = apply_step(self.variables, self.opt_state, acc)
        return inp, target, probs, step_rng

    def should_stop(self) -> bool:
        """Stop when max iterations are exceeded or the lr decayed below 1e-6."""
        if self.max_num_iterations < self.num_iterations:
            logger.info(f"Maximum number of iterations {self.max_num_iterations} exceeded.")
            return True

        min_lr = 1e-6
        lr = self.lr_handle.param_groups[0]["lr"]
        if lr < min_lr:
            logger.info(f"Learning rate below the minimum {min_lr}.")
            return True
        return False

    def validate(self):
        logger.info("Validating...")

        val_losses = RunningAverage()
        val_scores = RunningAverage()

        # stable random subset of batches for image logging
        rs = np.random.RandomState(42)
        n_val = len(self.loaders["val"])
        if n_val <= self.max_val_images:
            indices = set(range(n_val))
        else:
            indices = set(rs.choice(n_val, size=self.max_val_images, replace=False).tolist())

        if self._device_metric_fn is _UNSET:
            from pytorch3dunet_tpu.metrics import device_metric_fn

            self._device_metric_fn = device_metric_fn(self.eval_criterion)
            if self._device_metric_fn is not None:
                logger.info(f"Evaluation metric {type(self.eval_criterion).__name__} runs on device "
                            "(host transfer per batch: 2 scalars)")

        # batches stay in flight: losses/scores are device futures flushed at
        # the end (the host-metric/image batches synchronize inherently)
        pending: list = []
        for i, t in enumerate(self.loaders["val"]):
            raw, target_host = t
            # val files are identical on every host, so ragged val batches
            # replicate identical values (see get_train_loaders)
            inp, target = self._prepare_batch(raw, target_host, ragged_ok=True)
            self._ensure_initialized(inp)
            if self._eval_step_fn is None:
                self._eval_step_fn = self._build_eval_step()

            probs, loss = self._eval_step_fn(self._eval_variables(), inp, target)
            batch_size = self._batch_size(raw)

            if self._device_metric_fn is not None and i not in indices:
                # device twin: only two scalars ever leave the device
                pending.append((loss, self._device_metric_fn(probs, target), batch_size))
            else:
                out_np, tar_np = self._metric_inputs(probs, target)
                pending.append((loss, float(self.eval_criterion(out_np, tar_np)), batch_size))
                if i in indices:
                    self._log_images(np.asarray(raw), np.asarray(target_host), out_np, f"val_{i}_")

            if self.validate_iters is not None and self.validate_iters <= i:
                break

        for loss, score, batch_size in pending:
            val_losses.update(float(loss), batch_size)
            val_scores.update(float(score), batch_size)

        logger.info(f"Validation finished. Loss: {val_losses.avg}. Evaluation score: {val_scores.avg}")
        self._log_stats("val", val_losses.avg, val_scores.avg)
        return val_scores.avg

    # ------------------------------------------------------------ bookkeeping

    def _is_best_eval_score(self, eval_score: float) -> bool:
        if self.eval_score_higher_is_better:
            is_best = eval_score > self.best_eval_score
        else:
            is_best = eval_score < self.best_eval_score
        if is_best:
            logger.info(f"Saving new best evaluation metric: {eval_score}")
            self.best_eval_score = eval_score
        return is_best

    def _wait_checkpoint(self):
        """Joins the in-flight background save (surfacing its exceptions)."""
        if self._ckpt_future is not None:
            self._ckpt_future.result()
            self._ckpt_future = None

    def _save_checkpoint(self, is_best: bool):
        if jax.process_count() > 1 and jax.process_index() != 0:
            # params are replicated: one writer suffices on a shared FS (and
            # concurrent writes to the same path would corrupt the file)
            return
        # at most one save in flight: a second request first drains the first
        # (also serializes the last/best file writes)
        self._wait_checkpoint()
        last_file_path = os.path.join(self.checkpoint_dir, "last_checkpoint.pytorch")
        logger.info(f"Saving checkpoint to '{last_file_path}'")

        if self._snapshot_fn is None:
            # one compiled device-side tree copy per state structure: eager
            # per-leaf jnp.copy would dispatch hundreds of ops (seconds each
            # over a tunneled TPU); donation never aliases jit OUTPUTS, so the
            # copies survive the next train step donating the originals
            self._snapshot_fn = jax.jit(lambda t: jax.tree_util.tree_map(jnp.copy, t))

        trees = {
            "model_state_dict": self.variables,
            "optimizer_state_dict": self.opt_state,
            # EMA weights ride along; predict3dunet prefers them when
            # present (validation/best-selection used them too)
            **({"ema_state_dict": self.ema_params} if self.ema_params is not None else {}),
        }
        meta = {
            "num_epochs": self.num_epochs + 1,
            # the save runs after this iteration's update landed, so the NEXT
            # iteration number is the resume point: a resumed run's
            # validate/log cadence then continues the uninterrupted run's
            # exactly (the reference stores the pre-increment counter and
            # re-runs one iteration number, trainer.py:396)
            "num_iterations": self.num_iterations + 1,
            "best_eval_score": float(self.best_eval_score),
            # the step/augment PRNG key: restoring it makes a resumed run's
            # dropout/device-augment draws continue the interrupted stream
            # instead of restarting at PRNGKey(seed) (exact-resume support)
            "rng_state": np.asarray(jax.device_get(self._rng)),
        }
        if not self.async_checkpoint:
            state = {k: jax.device_get(v) for k, v in trees.items()}
            save_checkpoint({**meta, **state}, is_best, checkpoint_dir=self.checkpoint_dir)
            return
        snapshot = self._snapshot_fn(trees)

        def write():
            state = {k: jax.device_get(v) for k, v in snapshot.items()}
            save_checkpoint({**meta, **state}, is_best, checkpoint_dir=self.checkpoint_dir)

        self._ckpt_future = self._ckpt_executor.submit(write)

    def _log_lr(self):
        self.writer.add_scalar("learning_rate", self.lr_handle.lr, self.num_iterations)

    def _log_params(self, grads=None):
        """Histograms of parameters AND gradients (reference trainer.py:415-419)."""
        flat = jax.tree_util.tree_flatten_with_path(self.variables.get("params", {}))[0]
        for path, leaf in flat:
            name = "/".join(str(getattr(p, "key", p)) for p in path)
            self.writer.add_histogram(name, np.asarray(leaf), self.num_iterations)
        if grads is not None:
            for path, leaf in jax.tree_util.tree_flatten_with_path(grads)[0]:
                name = "/".join(str(getattr(p, "key", p)) for p in path)
                self.writer.add_histogram(name + "/grad", np.asarray(leaf), self.num_iterations)

    def _build_grad_fn(self):
        """Gradient-only step for histogram logging (runs at log cadence only,
        so the hot step never carries grads back to the host)."""
        model = self.model
        loss_criterion = self.loss_criterion

        def grads(variables, rng, inp, target):
            aux_state = {k: v for k, v in variables.items() if k != "params"}

            def loss_fn(params):
                if aux_state:
                    (probs, logits), _ = model.module.apply(
                        {"params": params, **aux_state}, inp, train=True,
                        rngs={"dropout": rng}, mutable=list(aux_state),
                    )
                else:
                    probs, logits = model.module.apply(
                        {"params": params}, inp, train=True, rngs={"dropout": rng}
                    )
                return loss_criterion(logits, target)

            return jax.grad(loss_fn)(variables["params"])

        return jax.jit(grads)

    def _log_stats(self, phase: str, loss_avg: float, eval_score_avg: float):
        for tag, value in {
            f"{phase}_loss_avg": loss_avg,
            f"{phase}_eval_score_avg": eval_score_avg,
        }.items():
            self.writer.add_scalar(tag, value, self.num_iterations)

    def _log_images(self, input_ncdhw, target, prediction_ncdhw, prefix: str):
        """Logs middle-slice images; all arrays in the reference NC(D)HW layout.

        Formatting + writing happens on a worker thread so it overlaps with
        the next train step; formatter errors surface on the next call (a bad
        image layout is a bug, not something to swallow).
        """
        if is_model_2d(self.model):
            # 2D batches: restore the singleton depth on EVERY tensor so the
            # formatter sees its documented NC(D)HW / NDHW layouts —
            # (N, C, H, W) inputs/predictions would otherwise be misread as
            # NDHW label volumes (label2rgb of float maps / shape asserts)
            def _add_z(b):
                if isinstance(b, (list, tuple)):
                    return [_add_z(x) for x in b]
                b = np.asarray(b)
                if b.ndim == 4:  # (N, C, H, W)
                    return b[:, :, None]
                if b.ndim == 3:  # (N, H, W) class map
                    return b[:, None]
                return b

            input_ncdhw = _add_z(input_ncdhw)
            target = _add_z(target)
            prediction_ncdhw = _add_z(prediction_ncdhw)
        inputs_map = {"inputs": input_ncdhw, "targets": target, "predictions": prediction_ncdhw}
        img_sources = {}
        for name, batch in inputs_map.items():
            if isinstance(batch, (list, tuple)):
                for i, b in enumerate(batch):
                    img_sources[f"{name}{i}"] = b
            else:
                img_sources[name] = batch

        # surface exceptions from previously submitted image writes
        for future in self._image_futures:
            if future.done():
                future.result()
        self._image_futures = [f for f in self._image_futures if not f.done()]

        iteration = self.num_iterations

        def write_images():
            for name, batch in img_sources.items():
                for tag, image in self.tensorboard_formatter(name, batch):
                    self.writer.add_image(prefix + tag, image, iteration)

        self._image_futures.append(self._image_executor.submit(write_images))
