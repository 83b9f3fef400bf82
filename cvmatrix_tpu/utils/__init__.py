from .aot import export_program, load_program
from .cache import enable_persistent_cache
from .tracing import is_concrete, ensure_x64

__all__ = [
    "enable_persistent_cache",
    "export_program",
    "is_concrete",
    "ensure_x64",
    "load_program",
]
