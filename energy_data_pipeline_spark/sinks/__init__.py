from .writers import (
    append,
    overwrite_date_range,
    truncate_reload,
    upsert,
)

__all__ = ["append", "overwrite_date_range", "truncate_reload", "upsert"]
