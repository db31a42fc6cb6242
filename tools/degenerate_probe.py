"""Per-query triage probe for the degenerate sweeps.

The sweeps (degenerate_sweep.py / degenerate_oracle_sweep.py) report
WHICH queries diverge; this prints BOTH frames side by side for the
named queries on one variant catalog, so the divergence is visible at
the value level — the fix-iterate loop used to close the r7 sweep.

Usage: python tools/degenerate_probe.py <variant> <query> [query ...]
  variant: empty | one | hostile | ties
Prints each query's Spark and DuckDB frames and a MATCH verdict using
the same canonical comparator as the parity suite.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests")
)


def main() -> None:
    import pandas as pd

    from degenerate_oracle_sweep import degenerate_duck_connection
    from degenerate_sweep import build
    from parity import _canon_frame

    from dateng_data_lakes_apache_spark_spark.registry import get_oracles, get_queries
    from dateng_data_lakes_apache_spark_spark.session import get_spark

    if len(sys.argv) < 3:
        sys.exit(__doc__)
    variant, names = sys.argv[1], sys.argv[2:]
    pd.set_option("display.width", 250)
    pd.set_option("display.max_columns", 50)
    spark = get_spark(app_name="degenerate-probe")
    spark.sparkContext.setLogLevel("ERROR")
    sf = build(spark, variant)
    qs, oracles = get_queries(), get_oracles()
    any_bad = False
    for n in names:
        print(f"===== {n} [{variant}] =====")
        spdf = ddf = None
        try:
            spdf = qs[n](spark, sf).toPandas()
            print("--- spark ---")
            print(spdf.to_string())
        except Exception as exc:  # noqa: BLE001 — a probe reports, never stops
            print("SPARK ERR:", str(exc)[:400])
        if n in oracles:
            con = degenerate_duck_connection(sf)
            try:
                ddf = con.execute(oracles[n]).df()
                print("--- duck ---")
                print(ddf.to_string())
            except Exception as exc:  # noqa: BLE001
                print("DUCK ERR:", str(exc)[:400])
            finally:
                con.close()
        else:
            print("(no oracle registered — run-only query)")
        if spdf is not None and ddf is not None:
            same = len(spdf) == len(ddf) and _canon_frame(spdf) == _canon_frame(ddf)
            print("MATCH:", same)
            any_bad |= not same
        else:
            any_bad = True
    sys.exit(1 if any_bad else 0)


if __name__ == "__main__":
    main()
