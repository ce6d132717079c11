"""Optimizer factory + LR scheduler unit tests."""

import jax.numpy as jnp
import numpy as np
import pytest

from pytorch3dunet_tpu.utils.checkpoint import load_checkpoint, save_checkpoint
from pytorch3dunet_tpu.utils.optim import (
    OptimizerHandle,
    CosineAnnealingLR,
    ExponentialLR,
    MultiStepLR,
    ReduceLROnPlateau,
    StepLR,
    create_lr_scheduler,
    create_optimizer,
    get_lr,
    set_lr,
)

OPTIMIZER_NAMES = ["Adam", "Adadelta", "Adagrad", "AdamW", "SparseAdam", "Adamax",
                   "NAdam", "RAdam", "RMSprop", "Rprop", "SGD", "LBFGS"]


@pytest.mark.parametrize("name", OPTIMIZER_NAMES)
def test_optimizer_factory_step(name):
    tx = create_optimizer({"name": name, "learning_rate": 1e-2, "weight_decay": 1e-5})
    params = {"w": jnp.ones((4, 4)), "b": jnp.zeros(4)}
    opt_state = tx.init(params)
    grads = {"w": jnp.ones((4, 4)) * 0.1, "b": jnp.ones(4) * 0.1}
    import optax

    new_params = params
    for _ in range(2):  # some optimizers (Rprop) warm up their sign history
        updates, opt_state = tx.update(grads, opt_state, new_params)
        new_params = optax.apply_updates(new_params, updates)
    assert np.isfinite(np.asarray(new_params["w"])).all()
    assert not np.allclose(np.asarray(new_params["w"]), np.asarray(params["w"]))


def test_lr_lives_in_opt_state():
    tx = create_optimizer({"name": "Adam", "learning_rate": 1e-3})
    params = {"w": jnp.ones(3)}
    opt_state = tx.init(params)
    assert get_lr(opt_state) == pytest.approx(1e-3)
    opt_state = set_lr(opt_state, 5e-4)
    assert get_lr(opt_state) == pytest.approx(5e-4)


class TestSchedulers:
    def test_multistep(self):
        h = OptimizerHandle(1.0)
        s = MultiStepLR(h, milestones=[2, 4], gamma=0.1)
        lrs = []
        for _ in range(5):
            s.step()
            lrs.append(h.lr)
        np.testing.assert_allclose(lrs, [1.0, 0.1, 0.1, 0.01, 0.01])

    def test_step_lr(self):
        h = OptimizerHandle(1.0)
        s = StepLR(h, step_size=2, gamma=0.5)
        for _ in range(4):
            s.step()
        assert h.lr == pytest.approx(0.25)

    def test_exponential(self):
        h = OptimizerHandle(1.0)
        s = ExponentialLR(h, gamma=0.9)
        for _ in range(3):
            s.step()
        assert h.lr == pytest.approx(0.9**3)

    def test_cosine(self):
        h = OptimizerHandle(1.0)
        s = CosineAnnealingLR(h, T_max=10)
        for _ in range(10):
            s.step()
        assert h.lr == pytest.approx(0.0, abs=1e-9)

    def test_plateau_min_mode(self):
        h = OptimizerHandle(1.0)
        s = ReduceLROnPlateau(h, mode="min", factor=0.1, patience=2)
        s.step(1.0)  # best
        for _ in range(3):  # 3 bad epochs > patience 2
            s.step(2.0)
        assert h.lr == pytest.approx(0.1)

    def test_plateau_max_mode_improvement_resets(self):
        h = OptimizerHandle(1.0)
        s = ReduceLROnPlateau(h, mode="max", factor=0.1, patience=2)
        s.step(0.5)
        s.step(0.4)
        s.step(0.6)  # improvement resets counter
        s.step(0.4)
        s.step(0.4)
        assert h.lr == pytest.approx(1.0)

    def test_factory(self):
        h = OptimizerHandle(1.0)
        s = create_lr_scheduler({"name": "MultiStepLR", "milestones": [1], "gamma": 0.5}, h)
        assert isinstance(s, MultiStepLR)
        assert create_lr_scheduler(None, h) is None


def test_checkpoint_roundtrip(tmpdir):
    state = {
        "num_epochs": 3,
        "num_iterations": 42,
        "best_eval_score": 0.75,
        "model_state_dict": {"params": {"w": np.random.rand(3, 4).astype(np.float32)}},
    }
    save_checkpoint(state, is_best=True, checkpoint_dir=str(tmpdir))
    import os

    template = {"params": {"w": np.zeros((3, 4), dtype=np.float32)}}
    loaded = load_checkpoint(os.path.join(str(tmpdir), "last_checkpoint.pytorch"), template)
    assert loaded["num_iterations"] == 42
    np.testing.assert_allclose(loaded["model_state_dict"]["params"]["w"],
                               state["model_state_dict"]["params"]["w"])
    assert os.path.exists(os.path.join(str(tmpdir), "best_checkpoint.pytorch"))


def test_torch_checkpoint_autodetect(tmpdir):
    """A reference-format torch checkpoint loads transparently."""
    import os

    import torch

    from pytorch3dunet_tpu.models import get_model

    # build a torch-style state dict matching a tiny UNet3D and save with torch
    cfg = {"name": "UNet3D", "in_channels": 1, "out_channels": 1, "f_maps": 8,
           "num_groups": 4, "num_levels": 2}
    path = os.path.join(str(tmpdir), "torch_ckpt.pytorch")
    state_dict = {
        "final_conv.weight": torch.randn(1, 8, 1, 1, 1),
        "final_conv.bias": torch.randn(1),
    }
    torch.save({"model_state_dict": state_dict}, path)

    loaded = load_checkpoint(path)
    params = loaded["model_state_dict"]["params"]
    assert params["final_conv"]["kernel"].shape == (1, 1, 1, 8, 1)


def test_lambda_lr_from_yaml_string():
    """LambdaLR accepts an expression string so YAML configs can use it."""
    from pytorch3dunet_tpu.utils.optim import OptimizerHandle, create_lr_scheduler

    handle = OptimizerHandle(1.0)
    sched = create_lr_scheduler({"name": "LambdaLR", "lr_lambda": "0.5 ** epoch"}, handle)
    for _ in range(3):
        sched.step()
    assert abs(handle.lr - 0.125) < 1e-9


def test_lambda_lr_rejects_non_arithmetic():
    """The YAML expression parser only admits arithmetic — no attribute
    escapes, imports, or subscripts (it replaced a stripped-builtins eval)."""
    from pytorch3dunet_tpu.utils.optim import _compile_lr_expression

    fn = _compile_lr_expression("math.exp(-epoch) * max(1, epoch)")
    assert abs(fn(0) - 1.0) < 1e-12
    for bad in [
        "__import__('os').system('true')",
        "().__class__.__bases__",
        "[epoch for epoch in (1,)][0]",
        "epoch.__class__",
        "open('/etc/passwd')",
    ]:
        with pytest.raises(ValueError):
            _compile_lr_expression(bad)


def test_unknown_scheduler_lists_supported_names():
    with pytest.raises(RuntimeError, match="OneCycleLR"):
        create_lr_scheduler({"name": "NoSuchScheduler"}, OptimizerHandle(1.0))


@pytest.mark.parametrize(
    "name,kwargs",
    [
        ("LinearLR", {"start_factor": 0.25, "end_factor": 1.0, "total_iters": 4}),
        ("PolynomialLR", {"total_iters": 6, "power": 2.0}),
        ("CosineAnnealingWarmRestarts", {"T_0": 3, "T_mult": 1, "eta_min": 0.01}),
        ("CosineAnnealingWarmRestarts", {"T_0": 2, "T_mult": 2, "eta_min": 0.0}),
        ("OneCycleLR", {"max_lr": 0.1, "total_steps": 10, "pct_start": 0.3}),
        ("OneCycleLR", {"max_lr": 0.1, "total_steps": 8, "anneal_strategy": "linear"}),
    ],
)
def test_scheduler_trajectory_matches_torch(name, kwargs):
    """Every epoch's lr matches torch.optim.lr_scheduler exactly (the
    reference resolves any torch scheduler by name, utils.py:319-328)."""
    import torch

    base_lr = 0.05
    p = torch.nn.Parameter(torch.zeros(1))
    torch_opt = torch.optim.SGD([p], lr=base_lr)
    torch_sched = getattr(torch.optim.lr_scheduler, name)(torch_opt, **kwargs)

    handle = OptimizerHandle(base_lr)
    ours = create_lr_scheduler({"name": name, **kwargs}, handle)

    n_steps = kwargs.get("total_steps", 9) - 1
    for step in range(n_steps):
        assert handle.lr == pytest.approx(torch_opt.param_groups[0]["lr"], rel=1e-9), f"step {step}"
        torch_opt.step()
        torch_sched.step()
        ours.step()
    assert handle.lr == pytest.approx(torch_opt.param_groups[0]["lr"], rel=1e-9)
