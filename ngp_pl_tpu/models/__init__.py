from ngp_pl_tpu.models.ngp import NGP, init_ngp_params  # noqa: F401
from ngp_pl_tpu.models.occupancy import OccupancyGridState  # noqa: F401
