"""Optimizer + LR-scheduler factories (optax-based).

Capability parity with the reference factories
(pytorch3dunet/unet3d/utils.py:246-328): the same optimizer names
(Adam default, Adadelta, Adagrad, AdamW, SparseAdam, Adamax, LBFGS, NAdam,
RAdam, RMSprop, Rprop, SGD) and the torch LR-scheduler names used by the
configs (ReduceLROnPlateau, MultiStepLR, StepLR, ExponentialLR,
CosineAnnealingLR, LambdaLR, ConstantLR).

Design: every optimizer is wrapped in `optax.inject_hyperparams` so the
learning rate lives inside the optimizer state pytree — schedulers mutate it
between steps without retracing the jitted train step. Weight-decay semantics
follow torch (L2 term added to the gradient before the moment updates), except
AdamW which is decoupled, as in torch.
"""

import math

import numpy as np
import optax

from pytorch3dunet_tpu.utils.misc import get_logger

logger = get_logger("Optim")


def _with_l2(tx: optax.GradientTransformation, weight_decay: float) -> optax.GradientTransformation:
    """torch-style weight decay: wd * param added to the gradient."""
    if weight_decay:
        return optax.chain(optax.add_decayed_weights(weight_decay), tx)
    return tx


def create_optimizer(optimizer_config: dict) -> optax.GradientTransformation:
    """Builds an optax optimizer from the reference's optimizer config schema."""
    optim_name = optimizer_config.get("name", "Adam")
    learning_rate = optimizer_config.get("learning_rate", 1e-3)
    weight_decay = optimizer_config.get("weight_decay", 0)
    betas = tuple(optimizer_config.get("betas", (0.9, 0.999)))
    # optional reduced-precision first moment (optax mu_dtype): halves the
    # Adam moment traffic; accuracy effect is negligible for these workloads
    mu_dtype = optimizer_config.get("mu_dtype")

    def build(learning_rate):
        if optim_name == "Adadelta":
            rho = optimizer_config.get("rho", 0.9)
            return _with_l2(optax.adadelta(learning_rate, rho=rho), weight_decay)
        if optim_name == "Adagrad":
            return _with_l2(optax.adagrad(learning_rate), weight_decay)
        if optim_name == "AdamW":
            return optax.adamw(learning_rate, b1=betas[0], b2=betas[1], weight_decay=weight_decay)
        if optim_name == "SparseAdam":
            # dense TPU params: plain Adam has identical semantics here
            return optax.adam(learning_rate, b1=betas[0], b2=betas[1])
        if optim_name == "Adamax":
            return _with_l2(optax.adamax(learning_rate, b1=betas[0], b2=betas[1]), weight_decay)
        if optim_name == "LBFGS":
            memory_size = optimizer_config.get("history_size", 100)
            return optax.chain(
                optax.scale_by_lbfgs(memory_size=memory_size),
                optax.scale(-learning_rate),
            )
        if optim_name == "NAdam":
            return _with_l2(optax.nadam(learning_rate, b1=betas[0], b2=betas[1]), weight_decay)
        if optim_name == "RAdam":
            return _with_l2(optax.radam(learning_rate, b1=betas[0], b2=betas[1]), weight_decay)
        if optim_name == "RMSprop":
            alpha = optimizer_config.get("alpha", 0.99)
            return _with_l2(optax.rmsprop(learning_rate, decay=alpha), weight_decay)
        if optim_name == "Rprop":
            etas = tuple(optimizer_config.get("etas", (0.5, 1.2)))
            step_sizes = tuple(optimizer_config.get("step_sizes", (1e-6, 50)))
            return optax.rprop(learning_rate, eta_minus=etas[0], eta_plus=etas[1],
                               min_step_size=step_sizes[0], max_step_size=step_sizes[1])
        if optim_name == "SGD":
            momentum = optimizer_config.get("momentum", 0) or None
            nesterov = optimizer_config.get("nesterov", False)
            return _with_l2(optax.sgd(learning_rate, momentum=momentum, nesterov=nesterov), weight_decay)
        # Adam is the default
        return _with_l2(optax.adam(learning_rate, b1=betas[0], b2=betas[1], mu_dtype=mu_dtype),
                        weight_decay)

    return optax.inject_hyperparams(build)(learning_rate=learning_rate)


def get_lr(opt_state) -> float:
    """Reads the current learning rate out of an inject_hyperparams state."""
    return float(opt_state.hyperparams["learning_rate"])


def set_lr(opt_state, lr: float):
    """Writes a new learning rate into an inject_hyperparams state (in place on host)."""
    import jax.numpy as jnp

    opt_state.hyperparams["learning_rate"] = jnp.asarray(lr, dtype=jnp.asarray(
        opt_state.hyperparams["learning_rate"]).dtype)
    return opt_state


class OptimizerHandle:
    """torch-shaped view over the optax state so schedulers and the trainer's
    stopping rule can read/write `param_groups[0]['lr']` exactly like the
    reference (trainer.py:302-306)."""

    def __init__(self, initial_lr: float):
        self.param_groups = [{"lr": initial_lr}]

    @property
    def lr(self) -> float:
        return self.param_groups[0]["lr"]

    @lr.setter
    def lr(self, value: float):
        self.param_groups[0]["lr"] = value


# ---------------------------------------------------------------------------
# LR schedulers (torch.optim.lr_scheduler name compatibility)
# ---------------------------------------------------------------------------


class _Scheduler:
    def __init__(self, optimizer: OptimizerHandle):
        self.optimizer = optimizer
        self.base_lr = optimizer.lr
        self.last_epoch = 0

    def step(self, metric=None):
        self.last_epoch += 1
        self.optimizer.lr = self.get_lr()

    def get_lr(self) -> float:
        raise NotImplementedError


class MultiStepLR(_Scheduler):
    def __init__(self, optimizer, milestones, gamma=0.1, **kwargs):
        super().__init__(optimizer)
        self.milestones = sorted(milestones)
        self.gamma = gamma

    def get_lr(self):
        passed = sum(1 for m in self.milestones if m <= self.last_epoch)
        return self.base_lr * (self.gamma**passed)


class StepLR(_Scheduler):
    def __init__(self, optimizer, step_size, gamma=0.1, **kwargs):
        super().__init__(optimizer)
        self.step_size = step_size
        self.gamma = gamma

    def get_lr(self):
        return self.base_lr * (self.gamma ** (self.last_epoch // self.step_size))


class ExponentialLR(_Scheduler):
    def __init__(self, optimizer, gamma, **kwargs):
        super().__init__(optimizer)
        self.gamma = gamma

    def get_lr(self):
        return self.base_lr * (self.gamma**self.last_epoch)


class CosineAnnealingLR(_Scheduler):
    def __init__(self, optimizer, T_max, eta_min=0.0, **kwargs):
        super().__init__(optimizer)
        self.T_max = T_max
        self.eta_min = eta_min

    def get_lr(self):
        return self.eta_min + (self.base_lr - self.eta_min) * (1 + math.cos(math.pi * self.last_epoch / self.T_max)) / 2


class ConstantLR(_Scheduler):
    def __init__(self, optimizer, factor=1.0 / 3, total_iters=5, **kwargs):
        super().__init__(optimizer)
        self.factor = factor
        self.total_iters = total_iters

    def get_lr(self):
        return self.base_lr * (self.factor if self.last_epoch < self.total_iters else 1.0)


def _compile_lr_expression(expr: str):
    """Compiles a YAML `lr_lambda` expression (e.g. ``"0.95 ** epoch"``) after
    validating its AST against an arithmetic-only allowlist — the config can
    only express arithmetic over `epoch`, `math.*`, and min/max/abs/round,
    never arbitrary code."""
    import ast

    tree = ast.parse(expr, mode="eval")
    for node in ast.walk(tree):
        if isinstance(node, (ast.Expression, ast.Constant, ast.Load, ast.Call,
                             ast.BinOp, ast.UnaryOp, ast.IfExp, ast.Compare,
                             ast.operator, ast.unaryop, ast.cmpop)):
            continue
        if isinstance(node, ast.Name) and node.id in ("epoch", "math", "min", "max", "abs", "round"):
            continue
        if (isinstance(node, ast.Attribute) and isinstance(node.value, ast.Name)
                and node.value.id == "math" and not node.attr.startswith("_")):
            continue
        raise ValueError(f"unsupported element in lr_lambda expression {expr!r}: {ast.dump(node)[:60]}")
    code = compile(tree, "<lr_lambda>", "eval")
    env = {"__builtins__": {}, "math": math, "min": min, "max": max, "abs": abs, "round": round}
    return lambda epoch: eval(code, env, {"epoch": epoch})  # noqa: S307 — AST-validated above


class LambdaLR(_Scheduler):
    """`lr_lambda` accepts a callable or — for YAML configs, where callables
    cannot be expressed — an arithmetic expression string in `epoch`, e.g.
    `lr_lambda: "0.95 ** epoch"` (AST-validated; `math` available)."""

    def __init__(self, optimizer, lr_lambda, **kwargs):
        super().__init__(optimizer)
        if isinstance(lr_lambda, str):
            lr_lambda = _compile_lr_expression(lr_lambda)
        self.lr_lambda = lr_lambda

    def get_lr(self):
        return self.base_lr * self.lr_lambda(self.last_epoch)


class LinearLR(_Scheduler):
    """Linear warmup/decay of the lr factor from start_factor to end_factor
    over total_iters epochs (torch LinearLR semantics)."""

    def __init__(self, optimizer, start_factor=1.0 / 3, end_factor=1.0, total_iters=5, **kwargs):
        super().__init__(optimizer)
        self.start_factor = start_factor
        self.end_factor = end_factor
        self.total_iters = total_iters

    def get_lr(self):
        progress = min(self.last_epoch, self.total_iters) / self.total_iters
        return self.base_lr * (self.start_factor + (self.end_factor - self.start_factor) * progress)


class PolynomialLR(_Scheduler):
    """Polynomial decay to zero over total_iters epochs (torch PolynomialLR)."""

    def __init__(self, optimizer, total_iters=5, power=1.0, **kwargs):
        super().__init__(optimizer)
        self.total_iters = total_iters
        self.power = power

    def get_lr(self):
        progress = min(self.last_epoch, self.total_iters) / self.total_iters
        return self.base_lr * (1.0 - progress) ** self.power


class CosineAnnealingWarmRestarts(_Scheduler):
    """SGDR cosine annealing with restarts every T_0 * T_mult^k epochs
    (torch CosineAnnealingWarmRestarts semantics)."""

    def __init__(self, optimizer, T_0, T_mult=1, eta_min=0.0, **kwargs):
        super().__init__(optimizer)
        assert T_0 > 0 and T_mult >= 1
        self.T_0 = T_0
        self.T_mult = T_mult
        self.eta_min = eta_min

    def get_lr(self):
        epoch = self.last_epoch
        if self.T_mult == 1:
            t_i, t_cur = self.T_0, epoch % self.T_0
        else:
            n = int(math.log(epoch / self.T_0 * (self.T_mult - 1) + 1, self.T_mult)) if epoch >= self.T_0 else 0
            t_i = self.T_0 * self.T_mult**n
            t_cur = epoch - self.T_0 * (self.T_mult**n - 1) // (self.T_mult - 1)
        return self.eta_min + (self.base_lr - self.eta_min) * (1 + math.cos(math.pi * t_cur / t_i)) / 2


class OneCycleLR(_Scheduler):
    """One-cycle policy: anneal max_lr/div_factor -> max_lr over the first
    pct_start of total_steps, then down to max_lr/(div_factor*final_div_factor)
    (torch OneCycleLR lr schedule; momentum cycling is not modeled)."""

    def __init__(self, optimizer, max_lr, total_steps, pct_start=0.3,
                 anneal_strategy="cos", div_factor=25.0, final_div_factor=1e4, **kwargs):
        super().__init__(optimizer)
        assert anneal_strategy in ("cos", "linear")
        if kwargs.get("three_phase"):
            # silently running a two-phase schedule against a three-phase
            # config would change the whole second half of training
            raise ValueError("OneCycleLR three_phase=True is not implemented; use the default two-phase schedule")
        self.max_lr = max_lr
        self.total_steps = total_steps
        self.pct_start = pct_start
        self.anneal_strategy = anneal_strategy
        self.initial_lr = max_lr / div_factor
        self.min_lr = self.initial_lr / final_div_factor

    def _anneal(self, start, end, pct):
        if self.anneal_strategy == "cos":
            return end + (start - end) * (1 + math.cos(math.pi * pct)) / 2
        return start + (end - start) * pct

    def get_lr(self):
        # torch lays the two phases over a (total_steps - 1) step grid with
        # the peak at pct_start * total_steps - 1
        step = min(self.last_epoch, self.total_steps - 1)
        peak = self.pct_start * self.total_steps - 1
        if step <= peak:
            return self._anneal(self.initial_lr, self.max_lr, step / max(peak, 1e-12))
        pct = (step - peak) / max(self.total_steps - 1 - peak, 1e-12)
        return self._anneal(self.max_lr, self.min_lr, pct)


class ReduceLROnPlateau:
    """torch-compatible plateau scheduler; `step(metric)` is called after every
    validation, as in the reference trainer (trainer.py:257-258)."""

    def __init__(self, optimizer, mode="min", factor=0.1, patience=10, threshold=1e-4,
                 threshold_mode="rel", cooldown=0, min_lr=0.0, eps=1e-8, **kwargs):
        assert factor < 1.0, "Factor should be < 1.0."
        self.optimizer = optimizer
        self.mode = mode
        self.factor = factor
        self.patience = patience
        self.threshold = threshold
        self.threshold_mode = threshold_mode
        self.cooldown = cooldown
        self.cooldown_counter = 0
        self.min_lr = min_lr
        self.eps = eps
        self.best = np.inf if mode == "min" else -np.inf
        self.num_bad_epochs = 0
        self.last_epoch = 0

    def _is_better(self, current):
        if self.mode == "min":
            if self.threshold_mode == "rel":
                return current < self.best * (1.0 - self.threshold)
            return current < self.best - self.threshold
        if self.threshold_mode == "rel":
            return current > self.best * (1.0 + self.threshold)
        return current > self.best + self.threshold

    def step(self, metric):
        self.last_epoch += 1
        current = float(metric)
        if self._is_better(current):
            self.best = current
            self.num_bad_epochs = 0
        else:
            self.num_bad_epochs += 1

        if self.cooldown_counter > 0:
            self.cooldown_counter -= 1
            self.num_bad_epochs = 0

        if self.num_bad_epochs > self.patience:
            old_lr = self.optimizer.lr
            new_lr = max(old_lr * self.factor, self.min_lr)
            if old_lr - new_lr > self.eps:
                self.optimizer.lr = new_lr
                logger.info(f"ReduceLROnPlateau: reducing learning rate to {new_lr}")
            self.cooldown_counter = self.cooldown
            self.num_bad_epochs = 0


_SCHEDULERS = {
    "ReduceLROnPlateau": ReduceLROnPlateau,
    "MultiStepLR": MultiStepLR,
    "StepLR": StepLR,
    "ExponentialLR": ExponentialLR,
    "CosineAnnealingLR": CosineAnnealingLR,
    "CosineAnnealingWarmRestarts": CosineAnnealingWarmRestarts,
    "ConstantLR": ConstantLR,
    "LinearLR": LinearLR,
    "PolynomialLR": PolynomialLR,
    "OneCycleLR": OneCycleLR,
    "LambdaLR": LambdaLR,
}


def create_lr_scheduler(lr_config: dict | None, optimizer: OptimizerHandle):
    """Resolves the scheduler by its torch name (reference: utils.py:319-328)."""
    if lr_config is None:
        return None
    lr_config = dict(lr_config)
    class_name = lr_config.pop("name")
    clazz = _SCHEDULERS.get(class_name)
    if clazz is None:
        raise RuntimeError(
            f"Unsupported lr scheduler: '{class_name}'. Supported names: {sorted(_SCHEDULERS)}"
        )
    sched = clazz(optimizer=optimizer, **lr_config)
    if isinstance(sched, _Scheduler):
        # torch constructors apply the epoch-0 lr immediately (their __init__
        # calls step() once): e.g. ConstantLR scales the whole first epoch
        sched.optimizer.lr = sched.get_lr()
    return sched
