"""Micro-bench: vectorized vs per-row string bucket hashing.

Run: python scripts/bench_bucket_hash.py [n_rows]
Prints one JSON line {vec_sec, per_row_sec, speedup} for a 1M-row
mixed-length string column (the write-path shape of a string-bucketed
partition spec). No Spark needed — this times the hash kernel itself.
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")
from iceberg_spark.murmur3 import hash_bytes_vec, hash_string  # noqa: E402

n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
vals = [f"user_{i}_{'x' * (i % 17)}" for i in range(n)]
bss = [v.encode("utf-8") for v in vals]
data = np.frombuffer(b"".join(bss), dtype=np.uint8)
offs = np.cumsum([0] + [len(b) for b in bss]).astype(np.int64)

t0 = time.perf_counter()
vec = hash_bytes_vec(data, offs)
vec_sec = time.perf_counter() - t0

sample = max(1, n // 10)
t0 = time.perf_counter()
ref = [hash_string(v) for v in vals[:sample]]
per_row_sec = (time.perf_counter() - t0) * (n / sample)

assert list(vec[:sample]) == ref  # bit-identity on the timed sample
print(json.dumps({
    "rows": n,
    "vec_sec": round(vec_sec, 4),
    "per_row_sec_est": round(per_row_sec, 4),
    "speedup": round(per_row_sec / vec_sec, 2),
}))
