"""README's stated query/oracle counts must match the live registry
(VERDICT r2 item 7: derived-at-build counts so docs can't go stale).

The README states counts in the sentence "exposes N named queries;
M carry exact DuckDB oracles". This test re-derives both from the
registry and fails on drift — update README.md when adding operators.
"""

from __future__ import annotations

import os
import re

from dateng_data_lakes_apache_spark_spark.registry import get_oracles, get_queries

README = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "README.md")


def test_readme_counts_match_registry():
    text = open(README).read()
    m = re.search(r"exposes (\d+) named queries;\s*(\d+) carry exact DuckDB oracles", text)
    assert m, "README count sentence not found — keep the wording greppable"
    stated_q, stated_o = int(m.group(1)), int(m.group(2))
    assert stated_q == len(get_queries()), (
        f"README says {stated_q} queries, registry has {len(get_queries())}"
    )
    assert stated_o == len(get_oracles()), (
        f"README says {stated_o} oracles, registry has {len(get_oracles())}"
    )
