"""convert3dunet CLI: convert checkpoints between this framework and the reference.

The reference ships published `.pytorch` checkpoints and its users have their
own trained ones (pytorch3dunet/unet3d/utils.py:15-65 format). Both CLIs here
already auto-detect and load torch checkpoints in place; this tool makes the
conversion explicit and bidirectional so models can move between frameworks
as files:

    # reference torch checkpoint -> native npz checkpoint
    convert3dunet --config train_config.yml -i best_checkpoint.pytorch -o native.ckpt

    # a model trained here -> a checkpoint the reference's predict.py can load
    convert3dunet --config train_config.yml -i last_checkpoint.pytorch -o for_torch.pytorch --to torch

The model section of the config is required: the native npz format restores
leaves positionally against a model-built template, and conversion validates
that the checkpoint actually matches the configured architecture.
"""

import argparse

import jax
import yaml

from pytorch3dunet_tpu.models import get_model
from pytorch3dunet_tpu.utils import get_logger
from pytorch3dunet_tpu.utils.checkpoint import _is_torch_checkpoint, load_checkpoint, state_to_bytes

logger = get_logger("ConvertCheckpoint")


def _parse_args(argv=None):
    parser = argparse.ArgumentParser(description="Convert checkpoints between torch and native formats")
    parser.add_argument("--config", required=True,
                        help="YAML config with the model section the checkpoint was trained with")
    parser.add_argument("--input", "-i", required=True, help="checkpoint to convert (torch or native)")
    parser.add_argument("--output", "-o", required=True, help="output checkpoint path")
    parser.add_argument("--to", choices=["auto", "torch", "native"], default="auto",
                        help="target format (default: the opposite of the input's)")
    return parser.parse_args(argv)


def convert_checkpoint(config: dict, input_path: str, output_path: str, to: str = "auto") -> str:
    """Converts `input_path` into `to` format at `output_path`; returns the format."""
    model = get_model(config["model"])
    template = jax.jit(lambda key: model.init(key))(jax.random.PRNGKey(0))

    input_is_torch = _is_torch_checkpoint(input_path)
    if to == "auto":
        to = "native" if input_is_torch else "torch"
    state = load_checkpoint(input_path, variables_template=template)
    variables = state["model_state_dict"]
    n_params = sum(x.size for x in jax.tree_util.tree_leaves(variables))

    if to == "torch":
        from pytorch3dunet_tpu.utils.torch_interop import save_torch_checkpoint

        save_torch_checkpoint(variables, output_path)
    else:
        if input_is_torch:
            # torch checkpoints carry no counters/optimizer state we can use;
            # write a fresh-start native checkpoint (weights only)
            state = {"model_state_dict": variables, "num_epochs": 0, "num_iterations": 1,
                     "best_eval_score": None}
        with open(output_path, "wb") as f:
            f.write(state_to_bytes(state))
    logger.info(
        f"Converted {input_path} ({'torch' if input_is_torch else 'native'}) -> "
        f"{output_path} ({to}); {n_params:,} parameters"
    )
    return to


def main(argv=None):
    args = _parse_args(argv)
    with open(args.config) as f:
        config = yaml.safe_load(f)
    assert "model" in config, "The config must contain a 'model' section"
    convert_checkpoint(config, args.input, args.output, to=args.to)


if __name__ == "__main__":
    main()
