from . import expressions, text, vectors

__all__ = ["expressions", "text", "vectors"]
