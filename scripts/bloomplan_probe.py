"""Driver-side Bloom PLANNING cost at file-count scale (VERDICT r9
item 7): fabricate synthetic manifests of 10^4 and 10^5 rows (1 KB
blobs, the default 8192-bit geometry) and time what
`bloom_pruned_parquet` pays BEFORE any scan plans —

* the manifest parquet read (pyarrow, blobs included), and
* `_bloom_prune_names` with a 10^3-key probe set (the "join this
  cohort" planning regime), absent-heavy (worst case: no early exit).

Also times the pre-round-10 scalar per-(file, value) loop at 10^4 rows
for the speedup ratio (at 10^5 it is minutes — the reason the
vectorized path exists).  Synthetic blobs are real `_bloom_bitmap`
output, so the probe exercises the production byte layout.

Run:  python scripts/bloomplan_probe.py
Prints a small table; numbers go into SCALE.md by hand.
"""

from __future__ import annotations

import os
import random
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pgstream_spark.sources.skipping import (  # noqa: E402
    _bloom_bitmap,
    _bloom_might_contain,
    _bloom_prune_names,
)

M_BITS, K, VALS_PER_FILE, N_KEYS = 8192, 6, 200, 1000


def fabricate(n_files: int) -> list[dict]:
    rng = random.Random(42)
    rows = []
    # ~50 distinct blob CONTENTS reused across files: building 10^5
    # real blobs costs minutes of md5 and proves nothing extra about
    # PROBE cost (each row still probes independently)
    pool = []
    for i in range(50):
        base = i * 10_000_000
        pool.append(
            _bloom_bitmap(
                [base + rng.randrange(5_000_000) for _ in range(VALS_PER_FILE)],
                "k", M_BITS, K,
            )
        )
    for f in range(n_files):
        rows.append({"file": f"f{f:06d}.parquet", "bloom_k": pool[f % 50]})
    return rows


def main() -> None:
    import pyarrow as pa
    import pyarrow.parquet as pq

    keys = [10**12 + i for i in range(N_KEYS)]  # absent everywhere
    print(f"geometry: m={M_BITS} k={K}, {VALS_PER_FILE} vals/blob, "
          f"{N_KEYS} probe keys (absent)")
    for n in (10_000, 100_000):
        rows = fabricate(n)
        with tempfile.TemporaryDirectory() as d:
            p = os.path.join(d, "_file_stats.parquet")
            pq.write_table(pa.Table.from_pylist(rows), p)
            t0 = time.perf_counter()
            got = pq.read_table(p).to_pylist()
            t_read = time.perf_counter() - t0
        t0 = time.perf_counter()
        kept = _bloom_prune_names(got, "k", keys)
        t_prune = time.perf_counter() - t0
        line = (
            f"n_files={n:>6}: manifest read {t_read:6.3f} s, "
            f"vectorized prune {t_prune:6.3f} s, kept {len(kept)}"
        )
        if n == 10_000:
            t0 = time.perf_counter()
            kept2 = []
            cache: dict = {}
            for r in got:
                blob = r["bloom_k"]
                if any(
                    _bloom_might_contain(blob, v, M_BITS, cache) for v in keys
                ):
                    kept2.append(r["file"])
            t_scalar = time.perf_counter() - t0
            assert sorted(kept2) == sorted(kept)
            line += f", scalar loop {t_scalar:6.3f} s ({t_scalar / t_prune:.0f}x)"
        print(line)


if __name__ == "__main__":
    main()
