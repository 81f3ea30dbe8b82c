from .catalog import CATALOG, flagship

__all__ = ["CATALOG", "flagship"]
