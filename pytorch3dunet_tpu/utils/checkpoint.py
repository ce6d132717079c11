"""Checkpoint save/load for param + optimizer pytrees.

Same workflow as the reference (pytorch3dunet/unet3d/utils.py:15-65,
trainer.py:382-403): `last_checkpoint.pytorch` written every validation cycle
and copied to `best_checkpoint.pytorch` on metric improvement; a checkpoint
carries {num_epochs, num_iterations, model_state_dict, best_eval_score,
optimizer_state_dict}. The on-disk format here is a compressed npz of
order-indexed flattened pytree leaves plus a small metadata record — no
pickle, so checkpoints are safe to load from untrusted sources. Leaves are
restored POSITIONALLY against the caller's state template (guarded by a
leaf-count check), so a checkpoint only loads into a same-structured state.
"""

import io
import json
import os
import shutil

import jax
import numpy as np

from pytorch3dunet_tpu.utils.misc import get_logger

logger = get_logger("Checkpoint")

LAST_CHECKPOINT = "last_checkpoint.pytorch"
BEST_CHECKPOINT = "best_checkpoint.pytorch"


def tree_leaves_list(tree) -> list[np.ndarray]:
    return [np.asarray(x) for x in jax.tree_util.tree_leaves(tree)]


def restore_tree(template, leaves: list[np.ndarray]):
    """Rebuilds a pytree with `template`'s structure from a flat leaves list."""
    treedef = jax.tree_util.tree_structure(template)
    template_leaves = jax.tree_util.tree_leaves(template)
    assert len(template_leaves) == len(leaves), (
        f"Checkpoint has {len(leaves)} leaves but the state expects {len(template_leaves)}"
    )
    cast = []
    for i, (t, leaf) in enumerate(zip(template_leaves, leaves)):
        t = np.asarray(t)
        leaf = np.asarray(leaf)
        # fail HERE with a clear message, not later inside the jitted step:
        # same structure + different shapes means e.g. a different f_maps
        if t.ndim > 0 and t.shape != leaf.shape:
            raise ValueError(
                f"Checkpoint leaf {i} has shape {leaf.shape} but the state expects {t.shape} "
                "(was the checkpoint trained with a different model configuration?)"
            )
        cast.append(leaf.astype(t.dtype))
    return jax.tree_util.tree_unflatten(treedef, cast)


def state_to_bytes(state: dict) -> bytes:
    """Serializes {metadata + pytrees} into one npz blob."""
    arrays = {}
    meta = {}
    for key, value in state.items():
        if isinstance(value, (int, float, str, bool)) or value is None:
            meta[key] = value
        else:
            # pytree: store ordered leaves under a reserved prefix
            leaves = tree_leaves_list(value)
            for i, leaf in enumerate(leaves):
                arrays[f"__tree__/{key}/{i:05d}"] = leaf
            meta[f"__tree_len__/{key}"] = len(leaves)
    arrays["__meta__"] = np.frombuffer(json.dumps(meta).encode(), dtype=np.uint8)
    buf = io.BytesIO()
    np.savez_compressed(buf, **arrays)
    return buf.getvalue()


def bytes_to_state(blob: bytes) -> dict:
    with np.load(io.BytesIO(blob), allow_pickle=False) as data:
        meta = json.loads(bytes(data["__meta__"].tobytes()).decode())
        state = {}
        trees = {}
        for key in data.files:
            if key.startswith("__tree__/"):
                _, tree_key, idx = key.split("/")
                trees.setdefault(tree_key, {})[int(idx)] = data[key]
        for key, value in meta.items():
            if key.startswith("__tree_len__/"):
                continue
            state[key] = value
        for key, value in meta.items():
            # a zero-leaf pytree stores no array entries; recreate its key so
            # the save/load round-trip preserves it (e.g. an EmptyState)
            if key.startswith("__tree_len__/") and value == 0:
                state[key.split("/", 1)[1]] = []
        for tree_key, leaves in trees.items():
            state[tree_key] = [leaves[i] for i in sorted(leaves)]
    return state


def save_checkpoint(state: dict, is_best: bool, checkpoint_dir: str):
    """Writes last_checkpoint.pytorch; copies to best_checkpoint.pytorch when best."""
    if not os.path.exists(checkpoint_dir):
        os.makedirs(checkpoint_dir, exist_ok=True)

    last_file_path = os.path.join(checkpoint_dir, LAST_CHECKPOINT)
    # atomic write-then-rename: a crash mid-write must never truncate the
    # only resume checkpoint in place
    tmp_path = last_file_path + ".tmp"
    try:
        with open(tmp_path, "wb") as f:
            f.write(state_to_bytes(state))
        os.replace(tmp_path, last_file_path)
    finally:
        if os.path.exists(tmp_path):
            os.unlink(tmp_path)
    if is_best:
        shutil.copyfile(last_file_path, os.path.join(checkpoint_dir, BEST_CHECKPOINT))


def _is_torch_checkpoint(path: str) -> bool:
    """Distinguishes a torch zip checkpoint from our npz format (both are zips)."""
    import zipfile

    try:
        with zipfile.ZipFile(path) as z:
            names = z.namelist()
        return any(n.endswith("data.pkl") for n in names) and "__meta__.npy" not in names
    except zipfile.BadZipFile:
        # legacy (pre-1.6) torch checkpoints are a bare pickle stream, not a
        # zip: route them to torch.load instead of a confusing np.load error
        with open(path, "rb") as f:
            return f.read(2).startswith(b"\x80")


def load_checkpoint(checkpoint_path: str, variables_template=None, opt_state_template=None) -> dict:
    """Loads a checkpoint; restores pytrees against the provided templates.

    Accepts both this framework's npz checkpoints and reference torch
    `.pytorch` checkpoints (auto-detected; weights converted via
    utils/torch_interop — the fine-tune/pretrained workflow of README.md:197-224
    in the reference works with published checkpoints).
    """
    if not os.path.exists(checkpoint_path):
        raise OSError(f"Checkpoint '{checkpoint_path}' does not exist")

    if _is_torch_checkpoint(checkpoint_path):
        from pytorch3dunet_tpu.utils.torch_interop import load_torch_checkpoint_as_variables

        logger.info(f"Detected torch checkpoint format: {checkpoint_path}")
        variables = load_torch_checkpoint_as_variables(checkpoint_path)
        if variables_template is not None:
            # template supplies any collection the checkpoint lacks; the
            # checkpoint's own collections (params AND imported batch_stats)
            # take precedence
            merged = dict(variables_template)
            merged.update(variables)
            variables = merged
        return {
            "model_state_dict": variables,
            "num_epochs": 0,
            "num_iterations": 1,
            "best_eval_score": None,
            # torch checkpoints carry a torch.optim state that has no optax
            # equivalent; callers re-initialize their optimizer
            "optimizer_state_dict": None,
        }

    with open(checkpoint_path, "rb") as f:
        state = bytes_to_state(f.read())

    if variables_template is not None and "model_state_dict" in state:
        state["model_state_dict"] = restore_tree(variables_template, state["model_state_dict"])
    if opt_state_template is not None and "optimizer_state_dict" in state:
        state["optimizer_state_dict"] = restore_tree(opt_state_template, state["optimizer_state_dict"])
    return state


def apply_ema_weights(state: dict, variables: dict) -> tuple[dict, bool]:
    """Swaps the checkpoint's EMA weights into `variables` when present.

    Checkpoints written with `trainer.ema_decay` carry an `ema_state_dict`
    alongside the raw weights; validation and best-checkpoint selection used
    the EMA weights, so inference should too. Returns (variables, used_ema).
    """
    ema_leaves = state.get("ema_state_dict")
    if not ema_leaves:
        return variables, False
    return {**variables, "params": restore_tree(variables["params"], ema_leaves)}, True
