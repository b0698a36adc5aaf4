"""Randomized-obfuscation fuzz of the SQL endpoint's two-layer gate
(round-11 VERDICT item 8). The hand-enumerated guard matrix in
test_web.py pins known shapes (comment-obfuscated, CTE-wrapped,
file-table, reflection); this module generates ARBITRARY
whitespace/comment/case/unicode-space permutations of write and DDL
statement forms with hypothesis and asserts:

  1. the PARSE gate alone (_plan_is_pure_read — structure, not text)
     rejects every obfuscated write form: whitespace and comments
     are lexer trivia, so no permutation can hide a Command /
     InsertIntoStatement / ParsedStatement node from the parsed plan
     (non-ASCII "whitespace" the lexer refuses is a parse error —
     also a rejection);
  2. the composed endpoint pipeline (text screen _sql_guard, then
     the parse gate) rejects them too — the text screen may catch
     them first, the parse gate is the backstop;
  3. sanity (the gate is not reject-everything): the same obfuscation
     applied to pure read forms still PASSES the parse gate.
"""

from __future__ import annotations

import pytest

from datasette_upload_csvs_spark.web import UploadApp

try:
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    _HAVE_HYP = True
except ImportError:  # pragma: no cover
    _HAVE_HYP = False

pytestmark = pytest.mark.skipif(
    not _HAVE_HYP, reason="hypothesis not installed"
)

# Write/DDL statement skeletons, tokenized so obfuscation lands at
# every token boundary. Covers DML (insert/update/delete/merge),
# DDL (create/drop/alter/truncate), session state (set/reset/use),
# cache, maintenance (analyze/msck/refresh), CTAS, CTE-smuggled
# insert, and directory overwrite — each parses to a Command /
# InsertIntoStatement / ParsedStatement node.
_WRITE_FORMS = [
    ["INSERT", "INTO", "t", "VALUES", "(1)"],
    ["INSERT", "OVERWRITE", "DIRECTORY", "'/tmp/x'", "SELECT", "1"],
    ["WITH", "c", "AS", "(SELECT 1 AS a)", "INSERT", "INTO", "t",
     "SELECT", "*", "FROM", "c"],
    ["UPDATE", "t", "SET", "a", "=", "2"],
    ["DELETE", "FROM", "t", "WHERE", "a", "=", "1"],
    ["MERGE", "INTO", "t", "USING", "s", "ON", "t.a", "=", "s.a",
     "WHEN", "MATCHED", "THEN", "DELETE"],
    ["DROP", "TABLE", "t"],
    ["DROP", "VIEW", "v"],
    ["CREATE", "TABLE", "t", "(a INT)"],
    ["CREATE", "TABLE", "t2", "AS", "SELECT", "1", "AS", "a"],
    ["CREATE", "OR", "REPLACE", "VIEW", "v", "AS", "SELECT", "1"],
    ["ALTER", "TABLE", "t", "ADD", "COLUMNS", "(b INT)"],
    ["TRUNCATE", "TABLE", "t"],
    ["SET", "spark.sql.shuffle.partitions", "=", "1"],
    ["RESET"],
    ["USE", "somedb"],
    ["CACHE", "TABLE", "t"],
    ["UNCACHE", "TABLE", "t"],
    ["REFRESH", "TABLE", "t"],
    ["ANALYZE", "TABLE", "t", "COMPUTE", "STATISTICS"],
    ["MSCK", "REPAIR", "TABLE", "t"],
]

_READ_FORMS = [
    ["SELECT", "1"],
    ["SELECT", "a,", "count(*)", "FROM", "t", "GROUP", "BY", "a"],
    ["WITH", "c", "AS", "(SELECT 1 AS a)", "SELECT", "*", "FROM", "c"],
    ["VALUES", "(1, 'x')"],
    ["SELECT", "*", "FROM", "t", "JOIN", "s", "ON", "t.a", "=", "s.a"],
]

# Token separators the lexer must treat as trivia: plain whitespace,
# bracketed comments (incl. nested newlines), line comments, and —
# reject-side only — unicode spaces the lexer may or may not accept
# (either way the statement cannot become a pure read). Comment
# separators carry surrounding spaces: glued to a `*` (e.g.
# `SELECT */*c*/FROM t`) the lexer sees an ambiguous `*/` and the
# statement stops being well-formed SQL at all — a parse error, not
# a gate verdict.
_SAFE_SEPS = [" ", "  ", "\t", "\n", "\r\n", " /*c*/ ", " /* x\ny */ ",
              " -- note\n", "\n--\n"]
_UNICODE_SEPS = [" ", " ", "　", " "]


def _obfuscate(data, tokens, seps):
    """Random case per keyword + a random separator at every token
    boundary (plus optional leading/trailing trivia)."""
    parts = []
    lead = data.draw(st.sampled_from([""] + seps))
    parts.append(lead)
    for i, tok in enumerate(tokens):
        # flip keyword case per character (identifiers/literals in
        # the skeletons are case-insensitive or quoted, so this is
        # always legal SQL)
        cased = "".join(
            ch.lower() if data.draw(st.booleans()) else ch.upper()
            for ch in tok
        )
        parts.append(cased)
        if i < len(tokens) - 1:
            parts.append(data.draw(st.sampled_from(seps)))
    parts.append(data.draw(st.sampled_from([""] + seps)))
    return "".join(parts)


def _fresh_session(spark):
    session = spark.newSession()
    session.conf.set("spark.sql.runSQLOnFiles", "false")
    return session


@settings(
    max_examples=60,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow,
                           HealthCheck.function_scoped_fixture],
)
@given(data=st.data())
def test_parse_gate_rejects_obfuscated_writes(spark, data):
    form = data.draw(st.sampled_from(_WRITE_FORMS))
    sql = _obfuscate(data, form, _SAFE_SEPS + _UNICODE_SEPS)
    session = _fresh_session(spark)
    err = UploadApp._plan_is_pure_read(session, sql)
    assert err is not None, f"parse gate admitted a write form: {sql!r}"
    # composed endpoint order: text screen first, parse gate second —
    # the pipeline as a whole must reject too
    text_err = UploadApp._sql_guard(sql)
    assert (text_err is not None) or (err is not None)


@settings(
    max_examples=40,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow,
                           HealthCheck.function_scoped_fixture],
)
@given(data=st.data())
def test_parse_gate_admits_obfuscated_reads(spark, data):
    form = data.draw(st.sampled_from(_READ_FORMS))
    sql = _obfuscate(data, form, _SAFE_SEPS)
    session = _fresh_session(spark)
    err = UploadApp._plan_is_pure_read(session, sql)
    assert err is None, f"parse gate rejected a pure read: {sql!r} -> {err}"
