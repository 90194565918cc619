"""The %%prql Jupyter magic (reference
book/src/integrations/jupyter.md documents the pyprql magic; this is
the Spark-first equivalent over compile_prql / to_sql)."""

from __future__ import annotations

import pytest

pytest.importorskip("IPython")

from IPython.core.interactiveshell import InteractiveShell  # noqa: E402

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def ip(spark):
    shell = InteractiveShell.instance()
    from prql_spark.magic import load_ipython_extension

    load_ipython_extension(shell)
    shell.run_line_magic("prql_connect", SF_DIR)
    return shell


def test_cell_magic_runs_and_binds(ip):
    df = ip.run_cell_magic(
        "prql", "top3", "from nation\nsort [n_name]\ntake 3"
    )
    rows = df.collect()
    assert len(rows) == 3
    assert rows[0].n_name <= rows[1].n_name <= rows[2].n_name
    assert ip.user_ns["top3"] is df
    # `spark` is exposed for follow-up cells
    assert ip.user_ns["spark"] is df.sparkSession


def test_cell_magic_pandas(ip):
    pdf = ip.run_cell_magic(
        "prql", "--pandas --max-rows 2", "from region\nsort [r_name]"
    )
    assert list(pdf.columns[:2]) == ["r_regionkey", "r_name"]
    assert len(pdf) == 2


def test_cell_magic_sql(ip, capsys):
    sql = ip.run_cell_magic(
        "prql", "--sql duckdb", "from nation\ntake 5"
    )
    assert "SELECT" in sql and "LIMIT 5" in sql
    assert "SELECT" in capsys.readouterr().out


def test_cell_magic_explain(ip, capsys):
    ip.run_cell_magic("prql", "--explain", "from nation\ntake 2")
    assert "Physical Plan" in capsys.readouterr().out


def test_cell_magic_errors(ip):
    with pytest.raises(ValueError, match="unknown %%prql flag"):
        ip.run_cell_magic("prql", "--nope", "from nation")
    fresh = InteractiveShell.instance()
    from prql_spark.magic import PrqlMagics

    m = PrqlMagics(fresh)
    fresh.user_ns.pop("catalog", None)
    with pytest.raises(RuntimeError, match="prql_connect"):
        m.prql("", "from nation")


def test_catalog_fallback_from_user_ns(ip, catalog):
    """A hand-built `catalog` variable works without %prql_connect."""
    from prql_spark.magic import PrqlMagics

    shell = InteractiveShell.instance()
    m = PrqlMagics(shell)
    shell.user_ns["catalog"] = catalog
    df = m.prql("", "from region\ntake 1")
    assert df.count() == 1
