#!/usr/bin/env python3
"""Time the daemon's two result lanes on the same property: TSV `GET`
(stdlib line protocol) vs `GETB` (binary Arrow IPC record batches).

Usage: getb_bench.py PORT [ROWS_EXPECTED]

Pair with `sbt "runMain graft.bench.GetbBench"` which serves a 12M-row
property and prints the port. Numbers land in BASELINE.md (round-4
verdict stretch #8: the Arrow framing existed without a measurement).
"""
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 1)[0])
from graft_client import GraftClient  # noqa: E402


def main():
    port = int(sys.argv[1])
    c = GraftClient("127.0.0.1", port, timeout=1800.0)
    # warm both lanes once on a small prefix (JIT, file open, plan)
    c.get("g", "score", limit=100000)
    c.get_arrow("g", "score", limit=100000)

    t0 = time.time()
    rows_tsv = len(c.get("g", "score"))
    tsv_s = time.time() - t0

    t0 = time.time()
    table = c.get_arrow("g", "score")
    arrow_s = time.time() - t0
    rows_arrow = table.num_rows

    assert rows_tsv == rows_arrow, (rows_tsv, rows_arrow)
    print(f"GETB-BENCH-RESULT rows={rows_tsv} "
          f"tsv_s={tsv_s:.1f} tsv_rows_per_s={rows_tsv / tsv_s:,.0f} "
          f"arrow_s={arrow_s:.1f} "
          f"arrow_rows_per_s={rows_arrow / arrow_s:,.0f} "
          f"speedup={tsv_s / arrow_s:.1f}x")


if __name__ == "__main__":
    main()
