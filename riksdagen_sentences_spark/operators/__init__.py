from . import dedup  # noqa: F401
