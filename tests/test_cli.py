"""In-process tests for the CLI front door (pkg/__main__.py) — the
round-9 verdict ask #3: every mode (KQL pipe, --sql, --query,
--list-queries), every output path (--show, --csv, --json),
arg-validation, and loud KQL-error surfacing.

The session is injected (``main(argv, spark=...)``) so the shared test
SparkSession is never stopped."""

import csv
import io
import json

import pytest

from azuredataengineering_deeplearning_spark.__main__ import main

SF = "/root/testdata/sf0.001"


def test_kql_pipe_show(spark, capsys):
    rc = main(["region | take 5", "--sf", SF], spark=spark)
    out = capsys.readouterr().out
    assert rc == 0
    assert "r_regionkey" in out


def test_sql_mode_csv(spark, capsys):
    rc = main(
        ["--sql", "SELECT count(*) AS n FROM region", "--sf", SF, "--csv"],
        spark=spark,
    )
    out = capsys.readouterr().out
    assert rc == 0
    rows = list(csv.reader(io.StringIO(out)))
    assert rows[0] == ["n"]
    assert rows[1] == ["5"]


def test_query_mode_json(spark, capsys):
    rc = main(
        ["--query", "kql_summarize", "--sf", SF, "--json"], spark=spark
    )
    out = capsys.readouterr().out
    assert rc == 0
    lines = [json.loads(ln) for ln in out.strip().splitlines()]
    assert len(lines) >= 1
    assert all(isinstance(d, dict) and d for d in lines)


def test_list_queries(spark, capsys):
    rc = main(["--list-queries"], spark=spark)
    out = capsys.readouterr().out.split()
    assert rc == 0
    assert "q1_pricing_summary" in out
    assert len(out) >= 300
    assert out == sorted(out)


def test_unknown_catalog_query(spark, capsys):
    rc = main(["--query", "no_such_query", "--sf", SF], spark=spark)
    assert rc == 2
    assert "unknown catalog query" in capsys.readouterr().err


def test_malformed_pipe_loud_error(spark, capsys):
    rc = main(["region | mv-expand ???", "--sf", SF], spark=spark)
    assert rc == 2
    assert "KQL error" in capsys.readouterr().err


def test_zero_modes_rejected(spark):
    with pytest.raises(SystemExit) as ei:
        main(["--sf", SF], spark=spark)
    assert ei.value.code == 2


def test_two_modes_rejected(spark):
    with pytest.raises(SystemExit) as ei:
        main(
            ["region | take 1", "--sql", "SELECT 1", "--sf", SF],
            spark=spark,
        )
    assert ei.value.code == 2


def test_missing_sf_rejected(spark, monkeypatch):
    monkeypatch.delenv("SPARK_GRAFT_SF_DIR", raising=False)
    with pytest.raises(SystemExit) as ei:
        main(["region | take 1"], spark=spark)
    assert ei.value.code == 2


def test_sf_env_fallback(spark, capsys, monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_SF_DIR", SF)
    rc = main(["nation | take 3"], spark=spark)
    assert rc == 0
    assert "n_nationkey" in capsys.readouterr().out


def test_cli_fork_prints_each_branch(spark, capsys):
    from azuredataengineering_deeplearning_spark.__main__ import main

    rc = main(
        [
            "events | where value > 50 | fork a=(count)"
            " (summarize m = max(value))",
            "--sf", SF, "--json",
        ],
        spark=spark,
    )
    out = capsys.readouterr().out
    assert rc == 0
    assert "-- fork branch: a --" in out
    assert "-- fork branch: fork_1 --" in out
