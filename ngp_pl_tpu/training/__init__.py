from ngp_pl_tpu.training.system import NeRFSystem  # noqa: F401
