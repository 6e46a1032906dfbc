from livecc_tpu.utils.multiproc import local_mp, local_mt
from livecc_tpu.utils.reporting import save_function_print

__all__ = ["local_mp", "local_mt", "save_function_print"]
