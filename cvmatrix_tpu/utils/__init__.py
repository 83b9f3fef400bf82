from .cache import enable_persistent_cache
from .tracing import is_concrete, ensure_x64

__all__ = ["enable_persistent_cache", "is_concrete", "ensure_x64"]
