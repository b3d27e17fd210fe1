from . import chain, icp, minimizers, outliers  # noqa: F401
from .icp import (ICPConfig, ICPResult, register, register_clouds,  # noqa: F401
                  register_with_covariance)
