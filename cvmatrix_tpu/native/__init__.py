from .loader import partition_int64, native_available

__all__ = ["partition_int64", "native_available"]
