"""Unit tests for the demand/layout feedback state machine
(NeRFSystem._consume_demand) — the host-side controller that picks the
train layout (csr / strided / rounds) and the pool / chain jit buckets from
the marcher's demand statistics.

These transitions decide which XLA variants compile and which quality
regime trains (VERDICT r3 weak-point #5), so every branch is pinned here
with synthetic demand vectors — no device step needed."""
from __future__ import annotations

import numpy as np
import pytest

from ngp_pl_tpu.config import TrainConfig
from ngp_pl_tpu.datasets.synthetic import SyntheticDataset
from ngp_pl_tpu.training.system import NeRFSystem


def make_system(**kw):
    tcfg = TrainConfig(dataset_name="synthetic", batch_size=1024,
                       num_epochs=2, exp_name="demand_test",
                       no_save_test=True, **kw)
    ds = SyntheticDataset(split="train", img_size=24, n_train=2)
    ts = SyntheticDataset(split="test", img_size=24, n_test=1)
    return NeRFSystem(tcfg, train_dataset=ds, test_dataset=ts)


def dv(rm_mean=20.0, chain_max=512, chain_q=400, rm_q=40, vr_q=30,
       vr_q90=25, vr_mean=18.0, alive_end=0, rm_mean_pre=None, B=1024):
    """Build a demand vector in the train_step packing order."""
    if rm_mean_pre is None:
        rm_mean_pre = rm_mean
    return np.asarray([rm_mean * B, chain_max, chain_q, rm_q, vr_q,
                       vr_q90, vr_mean, alive_end, rm_mean_pre], np.float32)


def feed(system, vec):
    """One controller invocation (primes the one-interval-late pipeline)."""
    system._consume_demand({"demand_vec": vec})


@pytest.fixture(scope="module")
def base_system():
    return make_system()


def reset(system, layout="csr", mult=None, mode=None):
    system.layout = layout
    system._pool_mult = mult or system.rcfg.train_pool_mult
    system._pool_demand = 0.0
    system._layout_vote = 0
    system._shrink_votes = 0
    system._pending_demand = None
    system.freeze_buckets = False
    system._host_step = 10 * system.tcfg.grid_warmup_steps
    if mode is not None:
        system.tcfg = system.tcfg.__class__(
            **{**system.tcfg.__dict__, "train_layout": mode})


def test_warmup_holds_initial_budget(base_system):
    s = base_system
    reset(s)
    s._host_step = 1      # inside grid warmup
    m0 = s._pool_mult
    feed(s, dv(rm_mean_pre=60.0))
    feed(s, dv(rm_mean_pre=60.0))
    assert s._pool_mult == m0 and s.layout == "csr"


def test_freeze_buckets_pins_everything(base_system):
    s = base_system
    reset(s)
    s.freeze_buckets = True
    m0, l0, c0 = s._pool_mult, s.layout, s.chain_length
    feed(s, dv(rm_mean_pre=60.0, rm_q=10))
    feed(s, dv(rm_mean_pre=60.0, rm_q=10))
    assert (s._pool_mult, s.layout, s.chain_length) == (m0, l0, c0)


def test_csr_sizes_from_preclip_mean(base_system):
    """Saturated-pool stats (clipped rm) must NOT deflate the budget: the
    pre-clip mean drives sizing (the round-4 limit-cycle fix)."""
    s = base_system
    reset(s, mult=24)
    # clipped rm says 24 (saturated), pre-clip truth says 40
    v = dv(rm_mean=24.0, rm_mean_pre=40.0, rm_q=300)
    feed(s, v)
    feed(s, v)      # consumed one interval late
    assert s.layout == "csr"
    assert s._pool_mult == 48     # 40 * 1.15 + 2 = 48 -> bucket 48


def test_heavy_tail_keeps_csr(base_system):
    """q99 beyond the bucket range makes strided ineligible (it would drop
    the same heavy rays from the loss every epoch)."""
    s = base_system
    reset(s, mult=32)
    v = dv(rm_mean_pre=15.0, rm_q=300)
    for _ in range(6):
        feed(s, v)
    assert s.layout == "csr"


def test_tight_demand_flips_to_strided_with_hysteresis(base_system):
    """Tail within buckets and within the CSR cost factor -> strided, but
    only after two agreeing intervals."""
    s = base_system
    reset(s, mult=32)
    v = dv(rm_mean_pre=20.0, rm_q=24)   # tail 25.2 -> bucket 32; mean -> 25->32
    feed(s, v)                           # prime
    feed(s, v)                           # vote 1
    assert s.layout == "csr" and s._layout_vote == 1
    feed(s, v)                           # vote 2 -> flip
    assert s.layout == "strided"
    assert s._pool_mult == 32


def test_flip_back_to_csr_when_tail_grows(base_system):
    s = base_system
    reset(s, layout="strided", mult=32)
    v = dv(rm_mean_pre=18.0, rm_q=200)
    feed(s, v)
    feed(s, v)
    assert s.layout == "strided"         # one vote: hysteresis holds
    feed(s, v)
    assert s.layout == "csr"


def test_sticky_down_needs_two_votes(base_system):
    """Growth is immediate; shrink waits 2 intervals (bucket-flap fix)."""
    s = base_system
    reset(s, mult=56)
    s._pool_demand = 56.0
    low = dv(rm_mean_pre=20.0, rm_q=300)   # want 25 -> bucket 32 eventually
    feed(s, low)   # prime
    feed(s, low)   # demand decays 0.8*56=44.8 -> bucket 48 < 56: vote 1
    assert s._pool_mult == 56
    feed(s, low)   # vote 2 -> shrink applies
    assert s._pool_mult < 56
    # growth is immediate
    hi = dv(rm_mean_pre=60.0, rm_q=300)
    feed(s, hi)
    feed(s, hi)
    assert s._pool_mult == 64


def test_chain_bucket_tracks_q99(base_system):
    s = base_system
    reset(s)
    s._chain_demand = float(s._chain_buckets[-1])
    s.chain_length = s._chain_buckets[-1]
    v = dv(rm_mean_pre=20.0, rm_q=300, chain_q=100)
    for _ in range(40):
        feed(s, v)      # 0.9 decay walks the chain demand down
    assert s.chain_length == s._chain_buckets[0]
    # and q99 growth raises it again immediately
    feed(s, dv(rm_mean_pre=20.0, rm_q=300,
               chain_q=s._chain_buckets[-1]))
    feed(s, dv(rm_mean_pre=20.0, rm_q=300,
               chain_q=s._chain_buckets[-1]))
    assert s.chain_length == s._chain_buckets[-1]


def test_rounds_mode_grows_on_alive_end():
    s = make_system(train_layout="rounds")
    reset(s, layout="rounds", mult=8)
    s._pool_demand = 8.0
    # many rays alive after the last round -> S must grow a bucket
    v = dv(vr_mean=6.0, alive_end=0.5 * 1024)
    feed(s, v)
    feed(s, v)
    assert s.layout == "rounds"
    assert s._pool_mult >= 16


def test_rounds_mode_follows_vr_mean():
    s = make_system(train_layout="rounds")
    reset(s, layout="rounds", mult=32)
    s._pool_demand = 32.0
    v = dv(vr_mean=6.0, alive_end=0)
    for _ in range(10):
        feed(s, v)      # decay 0.8 walks S down to the vr_mean bucket
    assert s._pool_mult == 16       # 6*0.9+4 = 9.4 -> smallest bucket >= 9.4
