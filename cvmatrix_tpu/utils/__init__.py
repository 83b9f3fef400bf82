from .tracing import is_concrete, ensure_x64

__all__ = ["is_concrete", "ensure_x64"]
