from . import bucketed, csv_single, smtp  # noqa: F401
