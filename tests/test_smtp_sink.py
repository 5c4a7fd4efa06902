"""SMTP sink behavior (K2–K5, reference app.py:328–377): dry-run receipts,
injected-failure retry accounting, idempotence ledger, CSV sink contract."""

from __future__ import annotations

import os


def _messages(spark, n=6):
    from etl_moodle_and_mass_email_sending_spark.plans import mailer

    rows = [
        (f"user{i}@x.cl", f"Nombre{i}", f"user{i}", f"pw{i}") for i in range(n)
    ]
    users = spark.createDataFrame(
        rows, "email string, nombre string, usuario string, contrasena string"
    )
    return mailer.render_messages(users, "Curso X", "https://aula.example.org/")


def test_dry_run_receipts(spark):
    from etl_moodle_and_mass_email_sending_spark.sinks.smtp import (
        SmtpConfig,
        send_all,
    )

    receipts = send_all(_messages(spark), SmtpConfig(dry_run=True)).collect()
    assert len(receipts) == 6
    by_idx = sorted(receipts, key=lambda r: r["idx"])
    assert [r["idx"] for r in by_idx] == list(range(1, 7))
    # countdown semantics (app.py:339): remaining = total - idx
    assert [r["remaining"] for r in by_idx] == [5, 4, 3, 2, 1, 0]
    assert all(r["status"] == "SENT" and r["attempts"] == 1 for r in receipts)


def test_two_pass_stamp_matches_global_sort(spark):
    """num_partitions>1 uses range-partition + offsets stamping; the
    resulting idx assignment must be IDENTICAL to the single-task global
    Window.orderBy path."""
    from etl_moodle_and_mass_email_sending_spark.sinks.smtp import (
        SmtpConfig,
        send_all,
    )

    msgs = _messages(spark, n=23)
    single = {
        r["email"]: (r["idx"], r["remaining"])
        for r in send_all(msgs, SmtpConfig(dry_run=True)).collect()
    }
    multi = {
        r["email"]: (r["idx"], r["remaining"])
        for r in send_all(
            msgs, SmtpConfig(dry_run=True), num_partitions=4
        ).collect()
    }
    assert multi == single
    assert sorted(i for i, _ in multi.values()) == list(range(1, 24))


def test_two_pass_stamp_plan_has_no_global_sort(spark):
    """The distributed stamp's plan must not contain a partition-less
    Window sort (the single-task funnel the two-pass path removes)."""
    from etl_moodle_and_mass_email_sending_spark.sinks.smtp import (
        _stamp_index_two_pass,
    )

    plan = _stamp_index_two_pass(
        _messages(spark, n=23), "email", 4
    )._jdf.queryExecution().executedPlan().toString()
    for line in plan.splitlines():
        if "Window" in line:
            assert "_pid" in line, f"global window in plan: {line}"


def test_retry_accounting(spark):
    from etl_moodle_and_mass_email_sending_spark.sinks.smtp import (
        SmtpConfig,
        send_all,
    )

    receipts = {
        r["email"]: r
        for r in send_all(
            _messages(spark),
            SmtpConfig(dry_run=True, max_retries=3),
            fail_spec={"user2@x.cl": 2},
        ).collect()
    }
    # transient failure → succeeds on 3rd attempt (app.py:363–372)
    assert receipts["user2@x.cl"]["status"] == "SENT"
    assert receipts["user2@x.cl"]["attempts"] == 3
    assert receipts["user0@x.cl"]["attempts"] == 1


def test_permanent_failure_marks_failed(spark):
    from etl_moodle_and_mass_email_sending_spark.sinks.smtp import (
        SmtpConfig,
        send_all,
    )

    receipts = {
        r["email"]: r
        for r in send_all(
            _messages(spark),
            SmtpConfig(dry_run=True, max_retries=3),
            fail_spec={"user3@x.cl": -1},
        ).collect()
    }
    # after MAX_RETRIES the row is FAILED and skipped (app.py:374–375)
    assert receipts["user3@x.cl"]["status"] == "FAILED"
    assert receipts["user3@x.cl"]["attempts"] == 3
    assert receipts["user3@x.cl"]["error"] == "injected failure"
    assert sum(1 for r in receipts.values() if r["status"] == "SENT") == 5


def test_idempotence_ledger(spark):
    """Re-run with a receipt ledger → already-sent recipients excluded
    (effectively-once; SURVEY.md §4.1 fault-tolerance note)."""
    from etl_moodle_and_mass_email_sending_spark.sinks.smtp import (
        SmtpConfig,
        send_all,
    )

    ledger = spark.createDataFrame(
        [("user0@x.cl",), ("user1@x.cl",)], "email string"
    )
    receipts = send_all(
        _messages(spark), SmtpConfig(dry_run=True), already_sent=ledger
    ).collect()
    emails = {r["email"] for r in receipts}
    assert emails == {f"user{i}@x.cl" for i in range(2, 6)}
    # idx re-stamped 1..4 over the remaining set
    assert sorted(r["idx"] for r in receipts) == [1, 2, 3, 4]


def test_csv_single_file_sink(spark, tmp_path):
    from etl_moodle_and_mass_email_sending_spark.sinks.csv_single import (
        write_csv_single,
    )

    out = str(tmp_path / "moodle.csv")
    df = spark.createDataFrame([("a", 1), ("b", 2)], "username string, type1 int")
    write_csv_single(df, out)
    assert os.path.isfile(out)
    lines = open(out, encoding="utf-8").read().strip().splitlines()
    assert lines[0] == "username,type1"
    assert sorted(lines[1:]) == ["a,1", "b,2"]


def test_partitioned_write_bounds_files(spark, tmp_path):
    """partitionBy write with repartition-on-keys: each partition dir has
    at most files_per_partition data files (the small-files guard), and
    the data round-trips."""
    import glob
    import os

    from etl_moodle_and_mass_email_sending_spark.sinks.partitioned import (
        write_partitioned,
    )

    df = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet").select(
        "l_orderkey", "l_quantity", "l_returnflag"
    )
    out1 = str(tmp_path / "p1")
    write_partitioned(df, out1, ["l_returnflag"], files_per_partition=1)
    for d in glob.glob(os.path.join(out1, "l_returnflag=*")):
        files = [f for f in os.listdir(d) if f.endswith(".parquet")]
        assert len(files) == 1, d
    assert spark.read.parquet(out1).count() == df.count()

    out2 = str(tmp_path / "p2")
    write_partitioned(df, out2, ["l_returnflag"], files_per_partition=3)
    for d in glob.glob(os.path.join(out2, "l_returnflag=*")):
        files = [f for f in os.listdir(d) if f.endswith(".parquet")]
        assert 1 <= len(files) <= 3, d
    assert spark.read.parquet(out2).count() == df.count()
