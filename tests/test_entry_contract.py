"""Driver-contract wiring: every queries() entry has an oracle twin and
the schemas the driver relies on stay importable without a live session."""

import __spark_entry__ as entry


def test_queries_and_oracle_keys_match():
    qs = entry.queries()
    sql = entry.oracle_sql()
    assert set(qs) == set(sql), set(qs) ^ set(sql)
    assert len(qs) >= 70
    assert all(callable(f) for f in qs.values())
    assert all(isinstance(s, str) and "SELECT" in s.upper() for s in sql.values())


def test_entry_callable_exists():
    assert callable(entry.entry)
