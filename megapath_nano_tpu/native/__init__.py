from megapath_nano_tpu.native.lib import load_native_lib

__all__ = ["load_native_lib"]
