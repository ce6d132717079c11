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
