"""Query-registration modules. Importing this package registers every
implemented query + oracle pair into :mod:`..registry`."""

from . import reference, relational  # noqa: F401
