from livecc_tpu.tools import filters, production

__all__ = ["filters", "production"]
