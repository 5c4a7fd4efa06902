from . import hashing, templates, text  # noqa: F401
