from . import csv_variants, excel, readers  # noqa: F401
