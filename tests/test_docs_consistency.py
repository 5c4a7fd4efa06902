"""Docs-vs-code consistency (round 9, VERDICT r8 item 8): SCALE.md's
round-8 section initially claimed 224 registered queries when the
registry held 226 — the ledger drifted from the code. This pins the
LAST "registry total ... **N**" claim in SCALE.md to
len(registry.queries()) so the docs can't drift again."""

from __future__ import annotations

import os
import re

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_scale_md_registry_total_matches_code():
    from etl_moodle_and_mass_email_sending_spark import registry

    with open(os.path.join(HERE, "SCALE.md")) as f:
        text = f.read()
    claims = re.findall(
        r"registry total[^\n]*?\*\*(\d+)\*\*", text, flags=re.IGNORECASE
    )
    assert claims, "SCALE.md must carry a 'registry total: **N**' line"
    assert int(claims[-1]) == len(registry.queries()), (
        f"SCALE.md claims {claims[-1]} registered queries; "
        f"registry has {len(registry.queries())}"
    )


def test_every_registered_query_is_ledgered():
    """Round-10 policy fix (VERDICT r9 item 5): the round-9 snapshot
    registered 5 queries with no SCALE.md entry and the total-only
    check couldn't name them. Every registered query name must now
    appear somewhere in SCALE.md (wave entry or the registry-index
    appendix) — an unledgered registration fails fast, by name."""
    from etl_moodle_and_mass_email_sending_spark import registry

    with open(os.path.join(HERE, "SCALE.md")) as f:
        text = f.read()
    missing = [n for n in registry.queries() if n not in text]
    assert not missing, (
        f"registered queries absent from SCALE.md: {missing} — add a "
        "wave entry and the registry-index appendix line"
    )


def test_scale_md_window_size_is_50():
    from etl_moodle_and_mass_email_sending_spark.registry import _WINDOW

    assert len(_WINDOW) == 50
    assert len(set(_WINDOW)) == 50


def test_no_oracle_outputs_ns_timestamps():
    """Round-14 systematization of the r12 ADVICE ns-timestamp hazard
    (VERDICT r13 item 5): events.ts is TIMESTAMP(NANOS) in parquet, so
    an oracle that outputs it raw yields a TIMESTAMP_NS column whose
    pandas repr can diverge from Spark's µs truncation on the next
    DuckDB upgrade. DESCRIBE every registered oracle against the
    sf0.001 views (plans only — nothing executes) and fail, by name,
    on any ns-typed output column."""
    import duckdb

    from etl_moodle_and_mass_email_sending_spark import registry

    sf = "/root/testdata/sf0.001"
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings".split()
    ):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf}/{t}.parquet')"
        )
    bad = []
    for name, sql in registry.oracle_sql().items():
        for row in con.execute(f"DESCRIBE ({sql})").fetchall():
            col, typ = row[0], row[1]
            if "TIMESTAMP_NS" in typ.upper():
                bad.append(f"{name}.{col}: {typ}")
    assert not bad, (
        "oracle SQL outputs raw ns timestamps (wrap in CAST(... AS "
        f"TIMESTAMP)): {bad}"
    )
