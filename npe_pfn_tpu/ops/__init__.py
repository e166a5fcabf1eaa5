from .flash_attention import flash_row_attention  # noqa: F401
