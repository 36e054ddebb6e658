"""Print the per-interval budget-demand vector on the bench scene."""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from ngp_pl_tpu.utils.jax_setup import enable_compilation_cache
enable_compilation_cache()
import numpy as np
from ngp_pl_tpu.config import TrainConfig
from ngp_pl_tpu.datasets.synthetic import SyntheticDataset
from ngp_pl_tpu.training.system import NeRFSystem

tcfg = TrainConfig(dataset_name="synthetic", batch_size=8192,
                   num_epochs=30, exp_name="diag", no_save_test=True)
train_ds = SyntheticDataset(split="train", img_size=96, n_train=8)
test_ds = SyntheticDataset(split="test", img_size=96, n_test=1)
system = NeRFSystem(tcfg, train_dataset=train_ds, test_dataset=test_ds)
system.on_train_start()
for i in range(100):
    m = system.step_block()
    dv = np.asarray(m["demand_vec"])
    rm, cmax, cq, rm_q, vr_q99, vr_q90, vr_mean = [float(v) for v in dv]
    print(f"blk {i:3d} pool x{system._pool_mult} chain {system.chain_length} "
          f"rm_tot {rm:.0f} rm/ray {rm/8192:.1f} rm_q99 {rm_q:.0f} "
          f"vr_q99 {vr_q99:.0f} vr_q90 {vr_q90:.0f} vr_mean {vr_mean:.1f} "
          f"pd {system._pool_demand:.1f}", flush=True)
