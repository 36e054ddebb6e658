"""Dataset registry (reference datasets/__init__.py)."""
from ngp_pl_tpu.datasets.nerf import NeRFDataset
from ngp_pl_tpu.datasets.nsvf import NSVFDataset
from ngp_pl_tpu.datasets.colmap import ColmapDataset
from ngp_pl_tpu.datasets.nerfpp import NeRFPPDataset
from ngp_pl_tpu.datasets.rtmv import RTMVDataset
from ngp_pl_tpu.datasets.synthetic import SyntheticDataset

dataset_dict = {
    "nerf": NeRFDataset,
    "nsvf": NSVFDataset,
    "colmap": ColmapDataset,
    "nerfpp": NeRFPPDataset,
    "rtmv": RTMVDataset,
    "synthetic": SyntheticDataset,
}
