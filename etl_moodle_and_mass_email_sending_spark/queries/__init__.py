"""Query-registration modules. Importing this package registers every
implemented query + oracle pair into :mod:`..registry`."""

from . import llmdata, reference, relational, streaming_q  # noqa: F401
