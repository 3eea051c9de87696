"""Driver-contract invariants: the registry shape the CORRECTNESS gate
depends on, pinned so a rotation edit cannot silently break it."""

import __spark_entry__ as entry


def test_window_is_exactly_50_oracle_bearing_rows():
    qs, os_ = entry.queries(), entry.oracle_sql()
    assert len(qs) == 50, len(qs)
    assert set(qs) == set(os_), set(qs) ^ set(os_)
    assert all(callable(f) for f in qs.values())
    assert all(isinstance(s, str) and s.strip() for s in os_.values())


def test_parked_registry_is_oracle_consistent():
    pq, po = entry.parked_queries(), entry.parked_oracle_sql()
    assert set(pq) == set(po), set(pq) ^ set(po)
    assert not set(pq) & set(entry.queries()), (
        "a query may not be seated AND parked"
    )
