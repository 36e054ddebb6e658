"""LPIPS (vgg variant) as a pure-JAX metric.

The reference scores test renders with torchmetrics' LPIPS-vgg
(reference train.py:27-31, 62-68, opt.py:55-56).  This is the same
computation as an XLA graph: VGG16 conv features tapped at
relu{1_2,2_2,3_3,4_3,5_3}, channel-unit-normalized, squared-difference,
1x1 "lin" weights, spatial mean, summed over taps (Zhang et al. 2018).

Pretrained weights cannot ship with a hermetic build, so the module is
weight-injected: `load_weights_npz` reads a single .npz (exported by
`export_from_torch_lpips`, or any dict matching the naming scheme), and
`lpips_fn` closes over the weight pytree.  With random weights the metric is
still a valid pseudo-distance (LPIPS(x, x) == 0, grows with perturbation) —
that contract is what the unit tests pin down.
"""
from __future__ import annotations

from typing import Dict, List

import jax
import jax.numpy as jnp
import numpy as np

# VGG16 conv plan: (out_channels, tap_after_relu?) per conv, 'M' = maxpool
_VGG16 = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
          512, 512, 512, "M", 512, 512, 512]
# taps after relu1_2, relu2_2, relu3_3, relu4_3, relu5_3 (conv indices)
_TAPS = (1, 3, 6, 9, 12)
_TAP_CHANNELS = (64, 128, 256, 512, 512)

# LPIPS input normalization constants (shift/scale applied to [-1, 1] input)
_SHIFT = np.asarray([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.asarray([0.458, 0.448, 0.450], np.float32)


def init_random_weights(key, dtype=jnp.float32) -> Dict[str, jnp.ndarray]:
    """Random He-initialized weights in the LPIPS naming scheme (testing /
    architecture-validation only — NOT a perceptual metric)."""
    params: Dict[str, jnp.ndarray] = {}
    c_in = 3
    ci = 0
    for spec in _VGG16:
        if spec == "M":
            continue
        key, k1, k2 = jax.random.split(key, 3)
        fan = c_in * 9
        params[f"conv{ci}_w"] = jax.random.normal(
            k1, (3, 3, c_in, spec), dtype) * (2.0 / fan) ** 0.5
        params[f"conv{ci}_b"] = jnp.zeros((spec,), dtype)
        c_in = spec
        ci += 1
    for ti, ch in enumerate(_TAP_CHANNELS):
        key, k = jax.random.split(key)
        params[f"lin{ti}_w"] = jax.random.uniform(k, (ch,), dtype, 0.0, 0.1)
    return params


def load_weights_npz(path: str) -> Dict[str, jnp.ndarray]:
    data = np.load(path)
    return {k: jnp.asarray(data[k]) for k in data.files}


def export_from_torch_lpips(out_path: str) -> bool:
    """Convert the `lpips` package's pretrained LPIPS(net='vgg') to our npz
    scheme.  Returns False when torch/lpips are unavailable."""
    try:
        import lpips as lpips_pkg
        import torch
    except Exception:
        return False
    net = lpips_pkg.LPIPS(net="vgg")
    params: Dict[str, np.ndarray] = {}
    convs = [m for m in net.net.slice1] + [m for m in net.net.slice2] \
        + [m for m in net.net.slice3] + [m for m in net.net.slice4] \
        + [m for m in net.net.slice5]
    ci = 0
    for m in convs:
        if isinstance(m, torch.nn.Conv2d):
            # torch OIHW -> HWIO
            params[f"conv{ci}_w"] = (
                m.weight.detach().numpy().transpose(2, 3, 1, 0))
            params[f"conv{ci}_b"] = m.bias.detach().numpy()
            ci += 1
    for ti, lin in enumerate(net.lins):
        params[f"lin{ti}_w"] = (
            lin.model[-1].weight.detach().numpy().reshape(-1))
    np.savez(out_path, **params)
    return True


def _features(params, x: jnp.ndarray) -> List[jnp.ndarray]:
    """x: (N, H, W, 3) in [-1, 1] -> list of tapped feature maps."""
    h = (x - jnp.asarray(_SHIFT)) / jnp.asarray(_SCALE)
    taps = []
    ci = 0
    for spec in _VGG16:
        if spec == "M":
            h = jax.lax.reduce_window(
                h, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID")
            continue
        h = jax.lax.conv_general_dilated(
            h, params[f"conv{ci}_w"], (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        h = h + params[f"conv{ci}_b"]
        h = jax.nn.relu(h)
        if ci in _TAPS:
            taps.append(h)
        ci += 1
    return taps


def lpips(params, img0: jnp.ndarray, img1: jnp.ndarray) -> jnp.ndarray:
    """img: (H, W, 3) or (N, H, W, 3) in [0, 1]. Returns per-image LPIPS."""
    if img0.ndim == 3:
        img0, img1 = img0[None], img1[None]
        squeeze = True
    else:
        squeeze = False
    x0 = img0 * 2.0 - 1.0
    x1 = img1 * 2.0 - 1.0
    total = 0.0
    for ti, (f0, f1) in enumerate(zip(_features(params, x0),
                                      _features(params, x1))):
        n0 = f0 / jnp.sqrt(jnp.sum(f0 ** 2, -1, keepdims=True) + 1e-10)
        n1 = f1 / jnp.sqrt(jnp.sum(f1 ** 2, -1, keepdims=True) + 1e-10)
        d = (n0 - n1) ** 2                               # (N, H', W', C)
        w = params[f"lin{ti}_w"]
        total = total + jnp.mean(jnp.sum(d * w[None, None, None, :], -1),
                                 axis=(1, 2))
    return total[0] if squeeze else total


def make_lpips_fn(params):
    f = jax.jit(lambda a, b: lpips(params, a, b))
    return f


if __name__ == "__main__":
    # Offline weight export (run where `pip install lpips torch` works):
    #     python -m ngp_pl_tpu.training.lpips_jax export lpips_vgg.npz
    # then set NGP_PL_TPU_LPIPS_NPZ=lpips_vgg.npz in the hermetic env.
    import sys

    if len(sys.argv) == 3 and sys.argv[1] == "export":
        if export_from_torch_lpips(sys.argv[2]):
            print(f"LPIPS-vgg weights -> {sys.argv[2]}")
        else:
            print("export failed: `lpips` / `torch` packages unavailable — "
                  "run on a machine with `pip install lpips torch`")
            sys.exit(1)
    else:
        print(__doc__)
        print("usage: python -m ngp_pl_tpu.training.lpips_jax export "
              "<out.npz>")
        sys.exit(2)
