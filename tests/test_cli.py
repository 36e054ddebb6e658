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
