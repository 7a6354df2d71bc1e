"""Smoke the driver contract: entry(), a sample of queries(), and
DuckDB parseability of every oracle_sql() statement."""

import sys

import duckdb
import pytest


@pytest.fixture(scope="module")
def entry_mod():
    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as m

    return m


def test_oracle_sql_parses(entry_mod):
    con = duckdb.connect()
    for t in ("region nation customer supplier part orders lineitem events "
              "documents embeddings").split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('/root/testdata/sf0.001/{t}.parquet')"
        )
    sqls = entry_mod.oracle_sql()
    assert set(sqls) <= set(entry_mod.queries())
    for name, sql in sqls.items():
        con.execute(sql).fetchall()  # must run, not just parse


def test_entry_and_query_sample(entry_mod, ray_session):
    res = entry_mod.entry()
    assert len(res) > 0 and {"doc_id", "score_r"} <= set(res.columns)
    qs = entry_mod.queries()
    sf = "/root/testdata/sf0.001"
    for name in ("bm25_topk_term", "phrase_match", "term_stats",
                 "lang_field_stats", "numeric_range_match"):
        out = qs[name](sf)
        assert len(out) >= 0 and len(out.columns) >= 1, name
