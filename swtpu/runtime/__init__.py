from swtpu.runtime.native import NativePacker, native_available

__all__ = ["NativePacker", "native_available"]
