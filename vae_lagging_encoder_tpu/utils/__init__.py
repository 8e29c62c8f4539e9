from .numeric import log_sum_exp
from .exp_utils import create_exp_dir, Logger

__all__ = ["log_sum_exp", "create_exp_dir", "Logger"]
