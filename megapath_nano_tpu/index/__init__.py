from megapath_nano_tpu.index.minimizer import MinimizerIndex, sketch

__all__ = ["MinimizerIndex", "sketch"]
