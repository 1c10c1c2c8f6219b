from . import filters, partitioning  # noqa: F401
