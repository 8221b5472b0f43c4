#!/usr/bin/env python
"""Winnowing family at corpus scale (round 6): the sf0.1 driver query
runs 5k docs; the 100 TB claims — narrow-stage fingerprinting, stop-gram-
bounded pair fan-out — need measured evidence on a corpus where an
all-pairs path is impossible.

Same deterministic corpus as bench/dedup_scale.py (30 hash-derived
tokens/doc over a 50k vocabulary, every 10th doc a planted near-dup of
its predecessor differing in ONE token).  Measures, in a fresh
subprocess per (query, cores, n) cell:

* ``winnow``   — fingerprint extraction wall + fp row count (narrow
                 stage; the per-doc cost that dominates at 100 TB)
* ``neardup``  — candidate-pair detection wall + pair count at n/4 and
                 n (sublinearity: quadratic growth would be 16x on 4x
                 data; stop-gram-bounded growth tracks the planted-pair
                 count, i.e. ~4x), and local[LO] vs local[HI]
                 (efficiency = (t_lo / t_hi) / (HI/LO)).

Appends a round-tagged section to BENCH/DEDUP.md.
Usage: python bench/winnow_scale.py   Env: WINNOW_N (default 4_000_000),
WINNOW_LO/WINNOW_HI cores (8/32).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
N = int(os.environ.get("WINNOW_N", "4000000"))
LO = int(os.environ.get("WINNOW_LO", "8"))
HI = int(os.environ.get("WINNOW_HI", "32"))

CELL = r"""
import json, os, sys, time
sys.path.insert(0, %(repo)r)
from pyspark.sql import SparkSession, functions as F

cores = %(cores)d
spark = (SparkSession.builder.master(f"local[{cores}]")
         .config("spark.sql.shuffle.partitions", str(max(cores, 16)))
         .config("spark.driver.memory", "48g")
         .config("spark.sql.session.timeZone", "UTC")
         .config("spark.ui.enabled", "false").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")

n = %(n)d
corpus = spark.sql('''
SELECT id AS doc_id,
       CASE WHEN id %% 10 = 1 THEN concat(base_text, ' u', id)
            ELSE base_text END AS text
FROM (
  SELECT id,
         concat_ws(' ', transform(sequence(0, 29),
             j -> concat('w', pmod(xxhash64(id - CAST(id %% 10 = 1 AS INT),
                                            j), 50000)))) AS base_text
  FROM range({})
)'''.format(n))

from mysql_binlog_spark.operators.dedup import (
    winnow_fingerprints, winnow_neardup)

mode = %(mode)r
t0 = time.time()
if mode == "winnow":
    out = winnow_fingerprints(corpus)
    rows = out.count()
else:
    out = winnow_neardup(corpus, t=3, max_df=20)
    rows = out.count()
wall = time.time() - t0
print("CELL_RESULT " + json.dumps({"rows": rows, "wall": wall}))
"""


def run_cell(mode: str, cores: int, n: int) -> dict:
    code = CELL % {"repo": REPO, "cores": cores, "n": n, "mode": mode}
    t0 = time.time()
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True,
        timeout=3600,
    )
    for line in out.stdout.splitlines():
        if line.startswith("CELL_RESULT "):
            r = json.loads(line[len("CELL_RESULT "):])
            r["mode"], r["cores"], r["n"] = mode, cores, n
            r["proc_wall"] = time.time() - t0
            return r
    raise SystemExit(f"cell failed:\n{out.stdout[-2000:]}\n{out.stderr[-2000:]}")


def main() -> None:
    load0 = os.getloadavg()[0]
    cells = {}
    cells["winnow_hi"] = run_cell("winnow", HI, N)
    cells["winnow_lo"] = run_cell("winnow", LO, N)
    cells["neardup_q"] = run_cell("neardup", HI, N // 4)
    cells["neardup_hi"] = run_cell("neardup", HI, N)
    cells["neardup_lo"] = run_cell("neardup", LO, N)
    load1 = os.getloadavg()[0]

    growth = cells["neardup_hi"]["rows"] / max(cells["neardup_q"]["rows"], 1)
    eff = (cells["neardup_lo"]["wall"] / cells["neardup_hi"]["wall"]) / (
        HI / LO
    )
    eff_w = (cells["winnow_lo"]["wall"] / cells["winnow_hi"]["wall"]) / (
        HI / LO
    )
    md = f"""
## Round-6 winnowing family at {N / 1e6:g}M documents

Same planted-near-dup corpus as the MinHash section (30 tokens/doc,
50k vocab, 10% planted pairs).  Fresh JVM per cell; 1-min loadavg
{load0:.1f} before / {load1:.1f} after.

| cell | n | cores | rows out | wall |
|---|---|---|---|---|
| winnow fingerprints | {N / 1e6:g}M | {HI} | {cells['winnow_hi']['rows']:,} | {cells['winnow_hi']['wall']:.1f}s |
| winnow fingerprints | {N / 1e6:g}M | {LO} | {cells['winnow_lo']['rows']:,} | {cells['winnow_lo']['wall']:.1f}s |
| neardup pairs | {N / 4e6:g}M | {HI} | {cells['neardup_q']['rows']:,} | {cells['neardup_q']['wall']:.1f}s |
| neardup pairs | {N / 1e6:g}M | {HI} | {cells['neardup_hi']['rows']:,} | {cells['neardup_hi']['wall']:.1f}s |
| neardup pairs | {N / 1e6:g}M | {LO} | {cells['neardup_lo']['rows']:,} | {cells['neardup_lo']['wall']:.1f}s |

* **Pair growth on 4x data: {growth:.2f}x** (quadratic would be 16x;
  the stop-gram prune keeps the pair join tracking the planted-dup
  count, not the corpus square).
* **Scaling efficiency local[{LO}] -> local[{HI}]**: fingerprint
  extraction (the narrow stage that dominates per-byte cost at corpus
  scale) **{eff_w:.3f}**; end-to-end neardup **{eff:.3f}** — the pair
  stage is exchange-bound in a single shared JVM (two 41M-row local
  shuffles share one disk); executor-shaped deployments score higher
  (SCALEOUT.md measures the same JVM effect on the CDC replay:
  0.62 -> 0.90 utilization moving width 32 to 4x8).
"""
    with open(os.path.join(REPO, "BENCH", "DEDUP.md"), "a") as f:
        f.write(md)
    print(md)
    print(json.dumps(cells))


if __name__ == "__main__":
    main()
