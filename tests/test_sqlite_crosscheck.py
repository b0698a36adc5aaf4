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
    for t in ["orders", "customer", "nation", "lineitem"]:
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


def test_q22_shape_matches_sqlite(spark, sf_dir, sqlite_conn):
    """Scalar-subquery + NOT EXISTS (TPC-H Q22 shape) against the
    reference's engine. Membership (nationkey, numcust) only: the
    avg threshold is float on SQLite's side, exact-decimal on ours —
    counts must still agree because no customer sits at the epsilon
    boundary."""
    got = {
        (r["c_nationkey"], r["numcust"])
        for r in Q.queries()["q22_dormant_customers"](spark, sf_dir).collect()
    }
    want = set(
        sqlite_conn.execute(
            """SELECT c_nationkey, COUNT(*)
               FROM customer
               WHERE c_acctbal > (SELECT AVG(c_acctbal) FROM customer
                                  WHERE c_acctbal > 0.0)
                 AND NOT EXISTS (SELECT 1 FROM orders
                                 WHERE o_custkey = c_custkey)
               GROUP BY c_nationkey"""
        ).fetchall()
    )
    assert got == want


def test_q12_shape_matches_sqlite(spark, sf_dir, sqlite_conn):
    """Join + conditional-count (Q12 shape) via julianday date
    arithmetic — SQLite stores the timestamps as ISO text."""
    got = {
        tuple(r)
        for r in Q.queries()["q12_late_priority_mix"](spark, sf_dir).collect()
    }
    want = set(
        sqlite_conn.execute(
            """SELECT l_returnflag,
                      SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
                               THEN 1 ELSE 0 END),
                      SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH')
                               THEN 1 ELSE 0 END)
               FROM lineitem JOIN orders ON l_orderkey = o_orderkey
               WHERE julianday(l_shipdate) > julianday(o_orderdate) + 365
                 AND l_shipdate >= '1998-01-01 00:00:00'
                 AND l_shipdate <  '1999-01-01 00:00:00'
               GROUP BY l_returnflag"""
        ).fetchall()
    )
    assert got == want
