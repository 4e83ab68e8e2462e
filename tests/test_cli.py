"""CLI surface: list/run registered queries, argument validation."""

from __future__ import annotations

from lion_parcel_etl_spark.cli import main


def test_cli_query_list(capsys):
    assert main(["query"]) == 0
    out = capsys.readouterr().out.splitlines()
    assert "pricing_summary" in out and len(out) > 100


def test_cli_query_unknown_and_missing_sf(capsys):
    assert main(["query", "no_such_query"]) == 2
    assert main(["query", "pricing_summary"]) == 2


def test_cli_query_runs(spark, sf_dir, capsys):
    # get_spark inside the CLI reuses the active test session
    assert main(["query", "order_limit", "--sf-dir", sf_dir, "--show", "3"]) == 0
    out = capsys.readouterr().out
    assert "rows: 100" in out
