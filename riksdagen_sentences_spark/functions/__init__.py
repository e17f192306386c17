from . import columns, udfs  # noqa: F401
