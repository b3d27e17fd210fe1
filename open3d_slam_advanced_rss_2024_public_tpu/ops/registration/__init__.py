from . import icp, minimizers, outliers  # noqa: F401
from .icp import ICPConfig, ICPResult, register, register_clouds  # noqa: F401
