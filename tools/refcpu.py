"""Second perf anchor: the REFERENCE torch implementation's measured train
throughput on this host's CPU (tiny-iteration run).

The `vs_baseline` denominator in bench.py is an A100 *estimate* (BENCH_NOTES
"Baseline": 3.1 TFLOP/step at 35% assumed cuDNN utilization). This script
replaces "single unmeasured estimate" with a measured consistency anchor: it
times the reference's literal hot loop (reference unet3d/trainer.py:231-285 —
forward, BCEDiceLoss on logits, backward, Adam step) on the canonical
workload (UNet3D f_maps=32, patch 80x170x170, batch 1) with torch CPU, and
prints the achieved voxels/sec and FLOP/s utilization so the A100 estimate's
assumed utilization can be sanity-checked against what torch actually
achieves on a host backend.

Usage: python tools/refcpu.py [n_steps]
"""

import sys
import time
import types

import numpy as np


def _stub_skimage():
    stubs = {
        "skimage": {},
        "skimage.color": {"label2rgb": lambda *a, **k: None},
        "skimage.exposure": {"rescale_intensity": None, "adjust_gamma": None},
        "skimage.filters": {"gaussian": None},
        "skimage.measure": {"label": None},
        "skimage.metrics": {"adapted_rand_error": None, "mean_squared_error": None,
                            "peak_signal_noise_ratio": None, "contingency_table": None},
        "skimage.segmentation": {"find_boundaries": None},
        "skimage.morphology": {},
    }
    for name, attrs in stubs.items():
        if name not in sys.modules:
            mod = types.ModuleType(name)
            for attr, val in attrs.items():
                setattr(mod, attr, val)
            sys.modules[name] = mod


def main(n_steps: int = 3):
    import torch

    _stub_skimage()
    sys.path.insert(0, "/root/reference")
    from pytorch3dunet.unet3d.losses import BCEDiceLoss
    from pytorch3dunet.unet3d.model import UNet3D

    torch.manual_seed(0)
    model = UNet3D(in_channels=1, out_channels=1, final_sigmoid=True,
                   f_maps=32, layer_order="gcr", num_groups=8)
    model.train()
    criterion = BCEDiceLoss(alpha=1.0)
    optimizer = torch.optim.Adam(model.parameters(), lr=2e-4)

    patch = (80, 170, 170)
    x = torch.rand(1, 1, *patch)
    y = (torch.rand(1, 1, *patch) > 0.5).float()

    def step():
        optimizer.zero_grad()
        # the reference trainer's forward pass: loss on LOGITS
        # (reference unet3d/trainer.py:351-365, model.py:103-149)
        probs, logits = model(x, return_logits=True)
        loss = criterion(logits, y)
        loss.backward()
        optimizer.step()
        return float(loss)

    print(f"torch {torch.__version__}, threads={torch.get_num_threads()}", flush=True)
    t0 = time.perf_counter()
    loss = step()  # warmup (allocations, algo selection)
    print(f"warmup step: {time.perf_counter() - t0:.1f}s loss={loss:.4f}", flush=True)

    t0 = time.perf_counter()
    for i in range(n_steps):
        loss = step()
        print(f"step {i}: cumulative {time.perf_counter() - t0:.1f}s loss={loss:.4f}", flush=True)
    dt = (time.perf_counter() - t0) / n_steps

    vox = int(np.prod(patch))
    flops = 3.1e12  # fwd+bwd FLOPs of this workload (BENCH_NOTES "Baseline")
    print(f"reference on CPU: {dt:.1f} s/step = {vox / dt / 1e6:.3f} Mvox/s "
          f"= {flops / dt / 1e9:.1f} GFLOP/s achieved", flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 3)
