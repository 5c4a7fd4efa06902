from . import bucketed, csv_single, partitioned, smtp  # noqa: F401
