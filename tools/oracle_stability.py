"""Oracle self-stability check: run every oracle_sql() N times in DuckDB
on the same parquet and compare canonicalized results run-to-run.

Catches the q15 class of verification-harness bug: a CTE with a parallel
floating-point aggregate referenced more than once is re-evaluated in a
different row order per reference, so equality/threshold comparisons
against the re-evaluated value can flip between runs (observed at the sf1
rehearsal: q15_top_supplier intermittently returned 0 rows 1-in-6 runs
BEFORE the MATERIALIZED fix). A nondeterministic oracle is worse than a
wrong one — it makes parity evidence unreproducible — so this runs the
oracle side alone, N times, and flags any query whose canonical hash
varies.

Usage: python tools/oracle_stability.py [sf_dir] [n_runs] [query ...]
"""

from __future__ import annotations

import hashlib
import sys

sys.path.insert(0, ".")

from check_parity import TABLES, canon  # noqa: E402


def main() -> int:
    import duckdb

    import __spark_entry__ as entry_mod

    args = sys.argv[1:]
    sf_dir = args[0] if args else "/root/testdata/sf0.1"
    n_runs = int(args[1]) if len(args) > 1 else 3
    only = set(args[2:])

    con = duckdb.connect()
    con.execute("SET temp_directory='/tmp/duckdb_stability_spill'")
    con.execute("SET max_temp_directory_size='4GB'")
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    oracles = entry_mod.oracle_sql()
    unstable = []
    for name, sql in sorted(oracles.items()):
        if only and name not in only:
            continue
        hashes = []
        err = None
        for _ in range(n_runs):
            try:
                rel = con.execute(sql)
                cols = [d[0] for d in rel.description]
                rows = rel.fetchall()
            except Exception as e:  # noqa: BLE001
                err = str(e).splitlines()[0]
                break
            h = hashlib.md5(
                "\x02".join(canon(rows, cols)).encode()
            ).hexdigest()
            hashes.append(h)
        if err:
            print(f"ERROR {name}: {err}")
            unstable.append(name)
        elif len(set(hashes)) > 1:
            print(f"UNSTABLE {name}: {len(set(hashes))} distinct results "
                  f"in {n_runs} runs")
            unstable.append(name)
        else:
            print(f"stable  {name}")
    print(f"\n{len(unstable)} unstable/erroring of {len(oracles)} oracles"
          + (f": {unstable}" if unstable else ""))
    return 1 if unstable else 0


if __name__ == "__main__":
    sys.path.insert(0, "tools")
    raise SystemExit(main())
