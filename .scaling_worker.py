
import json, os, sys, time
sys.path.insert(0, os.environ["NGP_REPO"])
from ngp_pl_tpu.utils.jax_setup import enable_compilation_cache
enable_compilation_cache()
import jax
import numpy as np
from ngp_pl_tpu.config import TrainConfig
from ngp_pl_tpu.datasets.synthetic import SyntheticDataset
from ngp_pl_tpu.training.system import NeRFSystem

n_dev = int(sys.argv[1])
per_dev_batch = int(sys.argv[2])
steps = int(sys.argv[3])
assert jax.device_count() >= n_dev, (jax.device_count(), n_dev)

tcfg = TrainConfig(dataset_name="synthetic",
                   batch_size=per_dev_batch * n_dev,
                   num_devices=n_dev, exp_name="scaling",
                   no_save_test=True)
train_ds = SyntheticDataset(split="train", img_size=64, n_train=4)
test_ds = SyntheticDataset(split="test", img_size=64, n_test=1)
system = NeRFSystem(tcfg, train_dataset=train_ds, test_dataset=test_ds)
system.on_train_start()

def fence(m):
    return float(np.asarray(m["loss"]))

nb = tcfg.grid_update_interval
warm = max(2, steps // (4 * nb))
for _ in range(warm):
    m = system.step_block()
fence(m)
system.freeze_buckets = True
t0 = time.time()
for _ in range(steps // nb):
    m = system.step_block()
fence(m)
dt = time.time() - t0
rays_per_s = tcfg.batch_size * (steps // nb) * nb / dt
print(json.dumps({"n_dev": n_dev, "rays_per_s": rays_per_s}))
