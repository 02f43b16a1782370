from megapath_nano_tpu.kernels.sw import banded_sw_scores

__all__ = ["banded_sw_scores"]
