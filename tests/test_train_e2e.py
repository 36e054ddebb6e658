"""End-to-end: train a tiny NGP on the procedural synthetic scene and verify
the whole numerics chain (march -> field -> composite -> loss -> adam) learns.
This is the CPU-runnable analogue of the reference's quality-gate validation
(SURVEY.md §4)."""
import numpy as np
import pytest

from ngp_pl_tpu.config import TrainConfig
from ngp_pl_tpu.datasets.synthetic import SyntheticDataset
from ngp_pl_tpu.training.system import NeRFSystem


def make_system(**cfg_kw):
    tcfg = TrainConfig(
        dataset_name="synthetic", batch_size=1024, num_epochs=2,
        iters_per_epoch=100, grid_warmup_steps=50, log_every=50,
        num_devices=1, **cfg_kw)
    train_ds = SyntheticDataset(split="train", img_size=64, n_train=10)
    test_ds = SyntheticDataset(split="test", img_size=64, n_test=2)
    return NeRFSystem(tcfg, train_dataset=train_ds, test_dataset=test_ds)


@pytest.fixture(scope="module")
def trained_system():
    sys = make_system()
    sys.on_train_start()
    losses = []
    for i in range(120):
        m = sys.step()
        losses.append(float(m["loss"]))
    sys._losses = losses
    return sys


def test_loss_decreases(trained_system):
    losses = trained_system._losses
    assert np.mean(losses[-20:]) < 0.5 * np.mean(losses[:5])


def test_train_psnr_reasonable(trained_system):
    m = trained_system.step()
    assert float(m["psnr"]) > 14.0


def test_validation_renders(trained_system):
    scores = trained_system.validate(save_images=False, max_images=1)
    assert "psnr" in scores and "ssim" in scores
    assert scores["psnr"] > 12.0
    assert 0.0 < scores["ssim"] <= 1.0


def test_checkpoint_roundtrip(tmp_path, trained_system):
    sys = trained_system
    p = str(tmp_path / "ckpt.npz")
    sys.save(p)
    sys2 = make_system()
    sys2.load(p)
    np.testing.assert_allclose(
        np.asarray(sys2.state.params["hash_table"]),
        np.asarray(sys.state.params["hash_table"]))
    assert int(sys2.state.step) == int(sys.state.step)
    # slim checkpoint
    ps = str(tmp_path / "slim.npz")
    sys.save_slim(ps)
    from ngp_pl_tpu.training.checkpoint import load_slim_checkpoint

    params, occ = load_slim_checkpoint(ps, params=sys2.state.params)
    np.testing.assert_array_equal(occ, np.asarray(sys.grid_state.occ_grid))


def test_device_dataset_mode_active(trained_system):
    """Synthetic rays fit the HBM budget -> on-device sampling is in use."""
    assert trained_system.rays_device is not None


def test_host_batch_path_matches_interface(trained_system):
    """Explicit host-sampled batches (the reference DataLoader contract)
    still drive the step."""
    b = trained_system.sample_batch()
    m = trained_system.step(b)
    assert np.isfinite(float(m["loss"]))
    assert float(m["psnr"]) > 10.0


def test_checkpoint_geometry_mismatch_errors(tmp_path, trained_system):
    """A checkpoint saved with one hash geometry must fail loudly when
    loaded into a model built with different flags (round-2 advisor
    finding: the L8F4-vs-L16F2 mismatch previously failed deep inside jit
    with a shape error)."""
    import pytest

    from ngp_pl_tpu.training.checkpoint import load_slim_checkpoint

    sys = trained_system
    p = str(tmp_path / "slim_geom.npz")
    sys.save_slim(p)

    other = make_system(n_levels=4, n_features=2)
    with pytest.raises(ValueError, match="different model geometry"):
        load_slim_checkpoint(p, params=other.state.params)


def test_nonfinite_grad_step_skipped(trained_system):
    """A step whose gradients blow up must leave params AND optimizer
    moments untouched — the semantics the reference gets from Lightning
    AMP's GradScaler (precision=16: inf/NaN-grad steps are skipped).
    Round 4: without this, one transient forward overflow at ~step 12.2k
    of a 30k-step run poisoned Adam state irrecoverably.

    The `count` leaves, however, DO advance (advisor r5): the reference's
    CosineAnnealingLR is stepped per epoch by Lightning regardless of
    GradScaler skips, so under sustained skipping the lr keeps decaying
    instead of freezing one interval behind state.step."""
    import jax

    sys = trained_system
    before_p = jax.tree_util.tree_map(np.asarray, sys.state.params)
    before_o = jax.tree_util.tree_map(np.asarray, sys.state.opt_state)

    b = sys.sample_batch()
    b = dict(b)
    rgb = np.asarray(b["rgb"]).copy()
    # poison EVERY target: a single bad ray can be sample-free (median ray
    # hits nothing), in which case its NaN never reaches any parameter
    rgb[:] = np.nan
    b["rgb"] = rgb
    m = sys.step(b)
    assert not bool(np.asarray(m["grads_finite"]))
    assert int(np.asarray(m["n_skipped"])) == 1

    after_p = jax.tree_util.tree_map(np.asarray, sys.state.params)
    after_o = jax.tree_util.tree_map(np.asarray, sys.state.opt_state)
    for bp, ap in zip(jax.tree_util.tree_leaves(before_p),
                      jax.tree_util.tree_leaves(after_p)):
        np.testing.assert_array_equal(bp, ap)

    def _is_count(path):
        return any(getattr(q, "name", None) == "count" for q in path)

    bo_leaves = jax.tree_util.tree_flatten_with_path(before_o)[0]
    ao_leaves = jax.tree_util.tree_flatten_with_path(after_o)[0]
    for (path, bo), (_, ao) in zip(bo_leaves, ao_leaves):
        if _is_count(path):
            np.testing.assert_array_equal(np.asarray(bo) + 1, ao)
        else:
            np.testing.assert_array_equal(bo, ao)

    # and a healthy step afterwards still updates + reports finite grads
    m2 = sys.step(sys.sample_batch())
    assert bool(np.asarray(m2["grads_finite"]))
    assert np.isfinite(float(m2["loss"]))
