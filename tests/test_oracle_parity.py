"""Local mirror of the driver's t2 gate: run every registered query on
Spark AND its DuckDB oracle at sf0.001, compare row-count, column names,
and order-insensitive values (doubles rounded to 9 significant places)."""

from __future__ import annotations

import math

import pytest

from conftest import SF_SMALL


def _canon(v):
    if v is None:
        return "∅"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{v:.9g}"
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_canon(x) for x in v) + "]"
    return str(v)


def _rowset(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(
        "|".join(_canon(r[i]) for i in order) for r in rows
    )


def _all_names():
    from etl_moodle_and_mass_email_sending_spark import registry

    return sorted(registry.oracle_sql())


@pytest.mark.parametrize("name", _all_names())
def test_query_matches_oracle(spark, duck, name):
    from etl_moodle_and_mass_email_sending_spark import registry

    sdf = registry.queries()[name](spark, SF_SMALL)
    srows = [tuple(r) for r in sdf.collect()]
    scols = sdf.columns

    res = duck.execute(registry.oracle_sql()[name])
    dcols = [d[0] for d in res.description]
    drows = res.fetchall()

    assert sorted(scols) == sorted(dcols), f"{name}: column names differ"
    assert len(srows) == len(drows), f"{name}: row count {len(srows)} != {len(drows)}"
    # a 0-row match is a trivial pass — every registered query must
    # actually exercise its operator on the testbed data
    assert len(srows) > 0, f"{name}: query returns no rows (trivial match)"
    sset, dset = _rowset(scols, srows), _rowset(dcols, drows)
    mism = [(a, b) for a, b in zip(sset, dset) if a != b][:5]
    assert sset == dset, f"{name}: first value mismatches: {mism}"


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    assert len(df.columns) >= 8


def test_certification_window_is_exactly_50_oracle_gated_entries():
    """The external gate certifies the first ~50 registry entries; the
    window must stay EXACTLY 50 (round 7 made it an explicit list —
    registry._WINDOW; new register() calls land in the tail until
    deliberately swapped in) and every window entry must carry a SQL
    oracle and resolve to a registered query — a typo'd _WINDOW name
    would silently shrink the certified set."""
    from etl_moodle_and_mass_email_sending_spark import registry

    names = list(registry.queries())
    oracles = registry.oracle_sql()
    assert len(registry._WINDOW) == 50
    unknown = [n for n in registry._WINDOW if n not in names]
    assert not unknown, f"_WINDOW names not registered: {unknown}"
    assert names[:50] == registry._WINDOW
    assert list(oracles)[:50] == registry._WINDOW
    missing = [n for n in registry._WINDOW if n not in oracles]
    assert not missing, f"window entries without oracles: {missing}"
