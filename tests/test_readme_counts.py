"""README's stated query/oracle counts must match the live registry
(VERDICT r2 item 7: derived-at-build counts so docs can't go stale).

The README states counts in the sentence "exposes N named queries, every
one carrying a DuckDB oracle: K direct SQL twins plus S
staged-expectation oracles". This test re-derives all three from the
registry and the staged_oracle() call sites and fails on drift — update
README.md when adding operators.
"""

from __future__ import annotations

import os
import re
from pathlib import Path

from dateng_data_lakes_apache_spark_spark.registry import get_oracles, get_queries

README = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "README.md")


def _staged_count() -> int:
    pkg = Path(README).parent / "dateng_data_lakes_apache_spark_spark"
    names = set()
    for py in pkg.rglob("*.py"):
        names |= set(re.findall(r"staged_oracle\(\s*\"(q_\w+)\"", py.read_text()))
    return len(names)


def test_readme_counts_match_registry():
    text = open(README).read()
    m = re.search(
        r"exposes (\d+) named queries,\s*every one carrying a DuckDB oracle:"
        r"\s*(\d+) direct SQL twins plus (\d+)\s*staged-expectation",
        text,
    )
    assert m, "README count sentence not found — keep the wording greppable"
    stated_q, stated_sql, stated_staged = map(int, m.groups())
    n_q, n_o, n_staged = len(get_queries()), len(get_oracles()), _staged_count()
    assert stated_q == n_q, f"README says {stated_q} queries, registry has {n_q}"
    assert n_o == n_q, f"registry oracle gap: {n_o} oracles vs {n_q} queries"
    assert stated_staged == n_staged, (
        f"README says {stated_staged} staged oracles, source has {n_staged}"
    )
    assert stated_sql == n_o - n_staged, (
        f"README says {stated_sql} SQL twins, registry derives {n_o - n_staged}"
    )
