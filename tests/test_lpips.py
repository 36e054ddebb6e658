"""LPIPS(vgg) JAX implementation: architecture + pseudo-distance contract.

Pretrained perceptual weights can't ship hermetically, so these tests pin
the weight-independent properties: identity -> 0, growth under perturbation,
shape handling, and the npz round-trip used for weight injection."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ngp_pl_tpu.training import lpips_jax
from ngp_pl_tpu.training.metrics import LPIPSHook


@pytest.fixture(scope="module")
def params():
    return lpips_jax.init_random_weights(jax.random.PRNGKey(0))


def test_identity_is_zero(params):
    img = jax.random.uniform(jax.random.PRNGKey(1), (33, 37, 3))
    d = float(lpips_jax.lpips(params, img, img))
    assert abs(d) < 1e-6


def test_grows_with_perturbation(params):
    key = jax.random.PRNGKey(2)
    img = jax.random.uniform(key, (32, 32, 3))
    noise = jax.random.normal(jax.random.PRNGKey(3), img.shape)
    d_small = float(lpips_jax.lpips(params, img,
                                    jnp.clip(img + 0.01 * noise, 0, 1)))
    d_big = float(lpips_jax.lpips(params, img,
                                  jnp.clip(img + 0.3 * noise, 0, 1)))
    assert 0 < d_small < d_big


def test_batched_matches_single(params):
    k = jax.random.PRNGKey(4)
    a = jax.random.uniform(k, (2, 32, 32, 3))
    b = jnp.clip(a + 0.1, 0, 1)
    batched = np.asarray(lpips_jax.lpips(params, a, b))
    singles = [float(lpips_jax.lpips(params, a[i], b[i])) for i in range(2)]
    np.testing.assert_allclose(batched, singles, rtol=1e-5)


def test_feature_tap_shapes(params):
    x = jnp.zeros((1, 64, 64, 3))
    taps = lpips_jax._features(params, x)
    assert [t.shape[-1] for t in taps] == [64, 128, 256, 512, 512]
    assert [t.shape[1] for t in taps] == [64, 32, 16, 8, 4]


def test_npz_weight_injection(tmp_path, params, monkeypatch):
    p = str(tmp_path / "w.npz")
    np.savez(p, **{k: np.asarray(v) for k, v in params.items()})
    loaded = lpips_jax.load_weights_npz(p)
    img = jax.random.uniform(jax.random.PRNGKey(5), (16, 16, 3))
    ref = float(lpips_jax.lpips(params, img, jnp.clip(img + 0.1, 0, 1)))
    got = float(lpips_jax.lpips(loaded, img, jnp.clip(img + 0.1, 0, 1)))
    assert abs(ref - got) < 1e-6
    # the hook activates through the env var path
    monkeypatch.setenv("NGP_PL_TPU_LPIPS_NPZ", p)
    hook = LPIPSHook()
    assert hook.available
    val = hook(np.asarray(img), np.clip(np.asarray(img) + 0.1, 0, 1))
    assert val is not None and val > 0


def test_eval_lpips_without_weights_fails_loudly(monkeypatch, tmp_path):
    """--eval_lpips with no weights available must raise with instructions,
    not silently skip the metric (reference always scores LPIPS-vgg,
    train.py:27-31)."""
    import pytest

    from ngp_pl_tpu.config import TrainConfig
    from ngp_pl_tpu.datasets.synthetic import SyntheticDataset
    from ngp_pl_tpu.training.system import NeRFSystem

    monkeypatch.delenv("NGP_PL_TPU_LPIPS_NPZ", raising=False)
    tcfg = TrainConfig(dataset_name="synthetic", batch_size=64,
                       exp_name="lpips_loud", no_save_test=True,
                       eval_lpips=True)
    ds = SyntheticDataset(split="train", img_size=16, n_train=2)
    ts = SyntheticDataset(split="test", img_size=16, n_test=1)
    system = NeRFSystem(tcfg, train_dataset=ds, test_dataset=ts)
    # force the no-weights state regardless of any ambient cache
    system.lpips._tried = True
    system.lpips._fn = None
    with pytest.raises(RuntimeError, match="NGP_PL_TPU_LPIPS_NPZ"):
        system.validate(save_images=False)
