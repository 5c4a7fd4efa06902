"""M6 — Structured Streaming variants (SURVEY.md §7.6, [EXT]).

The reference's send loop is a batch loop on a daemon thread
(app.py:1015–1033); here the same logical plan — variant-normalize →
render → deliver — runs as an incremental Structured Streaming job over a
watched roster drop directory, with watermarked dedup-by-recipient for
late/duplicate roster files and a foreachBatch SMTP sink that stays
effectively-once via a persistent receipt ledger.
"""

from . import joins, send_stream, windows  # noqa: F401
