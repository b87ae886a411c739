"""CLI front-door tests (python -m university_data_lakehouse_spark)."""

from __future__ import annotations

from university_data_lakehouse_spark.__main__ import main


def test_cli_list_and_run(spark, sf_dir, capsys, tmp_path):
    assert main(["list"]) == 0
    out = capsys.readouterr().out
    assert "olap_pricing_summary\t[oracle]" in out

    assert main(["run", "gold_status_funnel", "--sf-dir", sf_dir]) == 0
    out = capsys.readouterr().out
    assert "expected_revenue" in out or "status" in out

    assert main(["run", "no_such_query"]) == 2

    rc = main(["medallion", "--sf-dir", sf_dir,
               "--warehouse", str(tmp_path / "wh"),
               "--keys", "silver/dim_parts"])
    out = capsys.readouterr().out
    assert rc == 0 and "silver/dim_parts" in out
