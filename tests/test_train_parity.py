"""Training-accuracy parity: loss trajectories must match the reference.

Runs N full train steps (forward + loss + backward + SGD update) in BOTH
frameworks from identical ported weights on identical synthetic batches and
asserts the per-step losses agree. This is the Dice-parity foundation beyond
single-forward parity: if the loss trajectory tracks to ~1e-3 over several
updates, gradients and optimizer semantics agree end-to-end.

Reference loop being mirrored: pytorch3dunet/unet3d/trainer.py:231-246
(forward -> loss on logits -> zero_grad/backward/step). SGD is used as the
optimizer oracle (identical update rule in torch and optax; Adam's eps
placement differs subtly between frameworks).
"""

import jax
import numpy as np
import optax
import pytest
import torch

from tests.test_torch_parity import _import_reference, _np
from pytorch3dunet_tpu.losses import get_loss_criterion
from pytorch3dunet_tpu.models import get_model
from pytorch3dunet_tpu.utils.torch_interop import torch_state_dict_to_params

N_STEPS = 6
LR = 0.05
CFG = {"name": "UNet3D", "in_channels": 1, "out_channels": 2, "f_maps": 8,
       "num_groups": 4, "num_levels": 2, "final_sigmoid": True}
SHAPE = (2, 8, 16, 16)  # (N, D, H, W), single input channel


def _batches():
    rs = np.random.RandomState(1234)
    for _ in range(N_STEPS):
        x = rs.rand(SHAPE[0], 1, *SHAPE[1:]).astype(np.float32)  # NCDHW
        y = (rs.rand(SHAPE[0], CFG["out_channels"], *SHAPE[1:]) > 0.5).astype(np.float32)
        yield x, y


@pytest.mark.parametrize("loss_name", ["DiceLoss", "BCEWithLogitsLoss", "GeneralizedDiceLoss", "BCEDiceLoss"])
def test_sgd_loss_trajectory_matches_reference(loss_name):
    if not _import_reference():
        pytest.skip("reference package not importable")
    from pytorch3dunet.unet3d.losses import get_loss_criterion as torch_get_loss
    from pytorch3dunet.unet3d.model import get_model as torch_get_model

    torch.manual_seed(0)
    tmodel = torch_get_model(dict(CFG))
    tmodel.train()
    tcrit = torch_get_loss({"loss": {"name": loss_name}, "device": "cpu"})
    topt = torch.optim.SGD(tmodel.parameters(), lr=LR)

    torch_losses = []
    for x, y in _batches():
        topt.zero_grad()
        _, logits = tmodel(torch.from_numpy(x), return_logits=True)
        loss = tcrit(logits, torch.from_numpy(y))
        loss.backward()
        topt.step()
        torch_losses.append(float(loss.detach()))

    # --- jax side, from the SAME initial weights ---
    torch.manual_seed(0)
    t0 = torch_get_model(dict(CFG))
    params = torch_state_dict_to_params({k: _np(v) for k, v in t0.state_dict().items()})

    model = get_model(dict(CFG))
    crit = get_loss_criterion({"loss": {"name": loss_name}})
    tx = optax.sgd(LR)
    opt_state = tx.init(params)

    @jax.jit
    def train_step(params, opt_state, x, y):
        def loss_fn(p):
            _, logits = model.module.apply({"params": p}, x, train=True)
            return crit(logits, y)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    jax_losses = []
    for x, y in _batches():
        x_cl = np.moveaxis(x, 1, -1)
        y_cl = np.moveaxis(y, 1, -1)
        params, opt_state, loss = train_step(params, opt_state, x_cl, y_cl)
        jax_losses.append(float(loss))

    np.testing.assert_allclose(
        jax_losses, torch_losses, atol=1e-3, rtol=1e-3,
        err_msg=f"{loss_name} SGD loss trajectory diverged from the torch reference:\n"
                f"jax:   {jax_losses}\ntorch: {torch_losses}",
    )
    # the trajectory must actually train, not sit still
    assert torch_losses[-1] < torch_losses[0]


def test_adam_loss_trajectory_matches_reference():
    """Adam parity: torch.optim.Adam and optax.adam share the update rule
    (bias-corrected moments, eps outside the sqrt-root term); the trajectory
    must track within a slightly looser tolerance than SGD."""
    if not _import_reference():
        pytest.skip("reference package not importable")
    import optax as _optax
    from pytorch3dunet.unet3d.losses import get_loss_criterion as torch_get_loss
    from pytorch3dunet.unet3d.model import get_model as torch_get_model

    torch.manual_seed(0)
    tmodel = torch_get_model(dict(CFG))
    tmodel.train()
    tcrit = torch_get_loss({"loss": {"name": "DiceLoss"}, "device": "cpu"})
    topt = torch.optim.Adam(tmodel.parameters(), lr=1e-3)

    torch_losses = []
    for x, y in _batches():
        topt.zero_grad()
        _, logits = tmodel(torch.from_numpy(x), return_logits=True)
        loss = tcrit(logits, torch.from_numpy(y))
        loss.backward()
        topt.step()
        torch_losses.append(float(loss.detach()))

    torch.manual_seed(0)
    t0 = torch_get_model(dict(CFG))
    params = torch_state_dict_to_params({k: _np(v) for k, v in t0.state_dict().items()})
    model = get_model(dict(CFG))
    crit = get_loss_criterion({"loss": {"name": "DiceLoss"}})
    tx = _optax.adam(1e-3)
    opt_state = tx.init(params)

    @jax.jit
    def train_step(params, opt_state, x, y):
        def loss_fn(p):
            _, logits = model.module.apply({"params": p}, x, train=True)
            return crit(logits, y)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return _optax.apply_updates(params, updates), opt_state, loss

    jax_losses = []
    for x, y in _batches():
        params, opt_state, loss = train_step(
            params, opt_state, np.moveaxis(x, 1, -1), np.moveaxis(y, 1, -1))
        jax_losses.append(float(loss))

    np.testing.assert_allclose(jax_losses, torch_losses, atol=3e-3, rtol=3e-3)


# ---------------------------------------------------------------------------
# Long-horizon accuracy parity: the BASELINE claim is Dice/MSE parity <= 1e-3
# for a TRAINED model, not just loss-trajectory agreement over a few steps.
# Both frameworks train ~60 Adam steps from identical ported weights on a
# LEARNABLE synthetic target; the resulting metric values must agree.
# Reference loop: unet3d/trainer.py:231-285 + losses.py:11-37 + metrics.py:15-27.
# ---------------------------------------------------------------------------

LONG_STEPS = 60
CHECK_AT = (30, 45, 60)


def _learnable_volumes(n_vols=4, shape=(8, 16, 16), regression=False):
    """Smooth random fields with a structure the tiny UNet can actually learn:
    the label is a threshold of the (blurred) input, so Dice climbs well above
    chance within tens of steps."""
    from scipy.ndimage import gaussian_filter

    rs = np.random.RandomState(7)
    vols = []
    for _ in range(n_vols):
        raw = gaussian_filter(rs.rand(*shape).astype(np.float32), sigma=2.0)
        raw = (raw - raw.mean()) / (raw.std() + 1e-8)
        if regression:
            target = gaussian_filter(raw, sigma=1.0).astype(np.float32)
        else:
            target = (raw > 0.0).astype(np.float32)
        vols.append((raw[None, None], target[None, None]))  # NCDHW, N=1
    return vols


def _train_torch(cfg, loss_name, vols, n_steps, lr):
    from pytorch3dunet.unet3d.losses import get_loss_criterion as torch_get_loss
    from pytorch3dunet.unet3d.model import get_model as torch_get_model

    torch.manual_seed(0)
    tmodel = torch_get_model(dict(cfg))
    tmodel.train()
    tcrit = torch_get_loss({"loss": {"name": loss_name}, "device": "cpu"})
    topt = torch.optim.Adam(tmodel.parameters(), lr=lr)
    snapshots = {}
    for step in range(1, n_steps + 1):
        x, y = vols[(step - 1) % len(vols)]
        topt.zero_grad()
        _, logits = tmodel(torch.from_numpy(x), return_logits=True)
        loss = tcrit(logits, torch.from_numpy(y))
        loss.backward()
        topt.step()
        if step in CHECK_AT:
            tmodel.eval()
            with torch.no_grad():
                outs = [_np(tmodel(torch.from_numpy(x))) for x, _ in vols]
            tmodel.train()
            snapshots[step] = outs
    return snapshots


def _train_jax(cfg, loss_name, vols, n_steps, lr):
    from pytorch3dunet.unet3d.model import get_model as torch_get_model

    torch.manual_seed(0)
    t0 = torch_get_model(dict(cfg))
    params = torch_state_dict_to_params({k: _np(v) for k, v in t0.state_dict().items()})
    model = get_model(dict(cfg))
    crit = get_loss_criterion({"loss": {"name": loss_name}})
    tx = optax.adam(lr)
    opt_state = tx.init(params)

    @jax.jit
    def train_step(params, opt_state, x, y):
        def loss_fn(p):
            _, logits = model.module.apply({"params": p}, x, train=True)
            return crit(logits, y)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    @jax.jit
    def infer(params, x):
        probs, _ = model.module.apply({"params": params}, x, train=False)
        return probs

    snapshots = {}
    for step in range(1, n_steps + 1):
        x, y = vols[(step - 1) % len(vols)]
        params, opt_state, _ = train_step(
            params, opt_state, np.moveaxis(x, 1, -1), np.moveaxis(y, 1, -1))
        if step in CHECK_AT:
            snapshots[step] = [
                np.moveaxis(np.asarray(infer(params, np.moveaxis(x, 1, -1))), -1, 1) for x, _ in vols
            ]
    return snapshots


def test_long_horizon_dice_parity():
    """|Dice_jax - Dice_torch| <= 1e-3 at several checkpoints of a 60-step
    Adam run on a learnable target — the BASELINE.json parity claim."""
    if not _import_reference():
        pytest.skip("reference package not importable")
    from pytorch3dunet.unet3d.metrics import DiceCoefficient as TorchDice

    from pytorch3dunet_tpu.metrics import DiceCoefficient

    cfg = {"name": "UNet3D", "in_channels": 1, "out_channels": 1, "f_maps": 8,
           "num_groups": 4, "num_levels": 2, "final_sigmoid": True}
    vols = _learnable_volumes()
    t_snap = _train_torch(cfg, "DiceLoss", vols, LONG_STEPS, lr=1e-3)
    j_snap = _train_jax(cfg, "DiceLoss", vols, LONG_STEPS, lr=1e-3)

    t_dice_fn = TorchDice()
    j_dice_fn = DiceCoefficient()
    final_dice = None
    for step in CHECK_AT:
        t_dice = float(np.mean([
            float(t_dice_fn(torch.from_numpy(p), torch.from_numpy(y)))
            for p, (_, y) in zip(t_snap[step], vols)
        ]))
        j_dice = float(np.mean([j_dice_fn(p, y) for p, (_, y) in zip(j_snap[step], vols)]))
        assert abs(t_dice - j_dice) <= 1e-3, (step, t_dice, j_dice)
        final_dice = t_dice
    # the model must have actually learned the target, or the parity is vacuous
    assert final_dice > 0.75, final_dice


def test_long_horizon_mse_parity():
    """The regression analog: |MSE_jax - MSE_torch| <= 1e-3 after a 60-step
    Adam run with MSELoss (is_segmentation: false)."""
    if not _import_reference():
        pytest.skip("reference package not importable")

    cfg = {"name": "UNet3D", "in_channels": 1, "out_channels": 1, "f_maps": 8,
           "num_groups": 4, "num_levels": 2, "final_sigmoid": False,
           "is_segmentation": False}
    vols = _learnable_volumes(regression=True)
    t_snap = _train_torch(cfg, "MSELoss", vols, LONG_STEPS, lr=1e-3)
    j_snap = _train_jax(cfg, "MSELoss", vols, LONG_STEPS, lr=1e-3)

    for step in CHECK_AT:
        t_mse = float(np.mean([np.mean((p - y) ** 2) for p, (_, y) in zip(t_snap[step], vols)]))
        j_mse = float(np.mean([np.mean((p - y) ** 2) for p, (_, y) in zip(j_snap[step], vols)]))
        assert abs(t_mse - j_mse) <= 1e-3, (step, t_mse, j_mse)
    # training must reduce the error to a small fraction of the target power
    assert t_mse < 0.1, t_mse
