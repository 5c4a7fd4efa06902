"""Query-registration modules. Importing this package registers every
implemented query + oracle pair into :mod:`..registry`."""

from . import (  # noqa: F401
    finance,
    llmdata,
    quality,
    reference,
    streaming_q,
    tpch,
    windows,
)
