"""Parity spot-check against SQLite — the engine the reference
actually delegates queries to. DuckDB is the primary oracle (richer
SQL); this closes the loop to the reference's own engine for the
query shapes SQLite supports."""

from __future__ import annotations

import sqlite3

import pytest

from datasette_upload_csvs_spark import queries as Q


@pytest.fixture(scope="module")
def sqlite_conn(spark, sf_dir):
    con = sqlite3.connect(":memory:")
    for t in ["orders", "customer", "nation"]:
        pdf = Q.load(spark, sf_dir, t).toPandas()
        pdf.to_sql(t, con, index=False)
    yield con
    con.close()


def test_group_counts_match_sqlite(spark, sf_dir, sqlite_conn):
    got = {
        (r["o_orderpriority"], r["n"])
        for r in Q.load(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .count()
        .withColumnRenamed("count", "n")
        .collect()
    }
    want = set(
        sqlite_conn.execute(
            "SELECT o_orderpriority, COUNT(*) FROM orders GROUP BY 1"
        ).fetchall()
    )
    assert got == want


def test_left_join_counts_match_sqlite(spark, sf_dir, sqlite_conn):
    got = {
        (r["c_custkey"], r["n_orders"])
        for r in Q.queries()["left_join_order_counts"](spark, sf_dir)
        .select("c_custkey", "n_orders")
        .collect()
    }
    want = set(
        sqlite_conn.execute(
            """SELECT c_custkey, COUNT(o_orderkey)
               FROM customer LEFT JOIN orders ON c_custkey = o_custkey
               GROUP BY c_custkey"""
        ).fetchall()
    )
    assert got == want


def test_distinct_matches_sqlite(spark, sf_dir, sqlite_conn):
    got = {
        tuple(r)
        for r in Q.queries()["distinct_status_priority"](spark, sf_dir).collect()
    }
    want = set(
        sqlite_conn.execute(
            "SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders"
        ).fetchall()
    )
    assert got == want


def test_decimal_exact_sum_matches_sqlite(spark, sf_dir, sqlite_conn):
    """SQLite sums doubles in scan order; our decimal-exact sum must
    agree to the cent on 2-decimal money data."""
    got = (
        Q.queries()["having_filter"](spark, sf_dir)
        .selectExpr("sum(cast(sum_total as decimal(28,4)))")
        .collect()[0][0]
    )
    want = sqlite_conn.execute(
        """SELECT SUM(s) FROM (
             SELECT o_custkey, COUNT(*) n, SUM(o_totalprice) s
             FROM orders GROUP BY o_custkey HAVING COUNT(*) >= 15)"""
    ).fetchone()[0]
    assert abs(float(got) - want) < 0.01
