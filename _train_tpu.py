import time
t0 = time.time()
from ngp_pl_tpu.utils.jax_setup import enable_compilation_cache
enable_compilation_cache()
import jax, numpy as np
from ngp_pl_tpu.config import TrainConfig
from ngp_pl_tpu.datasets.synthetic import SyntheticDataset
from ngp_pl_tpu.training.system import NeRFSystem

tcfg = TrainConfig(dataset_name="synthetic", batch_size=8192, num_epochs=2,
                   iters_per_epoch=1000, exp_name="qual", no_save_test=True,
                   log_every=200)
train_ds = SyntheticDataset(split="train", img_size=256, n_train=24)
test_ds = SyntheticDataset(split="test", img_size=256, n_test=2)
print(f"[{time.time()-t0:.0f}s] data ready", flush=True)
sys_ = NeRFSystem(tcfg, train_dataset=train_ds, test_dataset=test_ds)
sys_.fit(max_steps=2000)
print(f"[{time.time()-t0:.0f}s] trained", flush=True)
scores = sys_.validate(save_images=True)
print(f"[{time.time()-t0:.0f}s] val: {scores}", flush=True)
