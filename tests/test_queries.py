"""Smoke the declared driver contract at sf0.001 (the oracle comparison
itself runs via tools/check_oracle.py at sf0.01 — too slow for unit CI)."""

import __spark_entry__ as entrymod


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0


def test_all_queries_run_and_have_stable_schemas(spark, sf_dir):
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    assert qs, "no declared queries"
    for name, fn in qs.items():
        df = fn(spark, sf_dir)
        assert df.columns, name
        assert df.count() >= 0, name
    # every oracle key must have a query
    assert set(oracles) <= set(qs)


def test_oracle_sql_strings_are_duckdb_runnable(sf_dir):
    import duckdb
    import os

    con = duckdb.connect()
    for t in [
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings",
    ]:
        p = os.path.join(sf_dir, f"{t}.parquet")
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    for name, sql in entrymod.oracle_sql().items():
        n = len(con.execute(sql).fetchall())
        assert n >= 0, name
