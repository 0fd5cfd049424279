#!/usr/bin/env python
"""The reference's own benchmark workload, at full scale: sum of primes
in [1,000,000,001 .. 1,000,300,000] (300,000 candidates; Simple.pm:836-929,
README.md:315-408). Reference numbers: ~60 s serial Perl, ~10 s via
map_reduce on 2 workers × "20 cores over" + 10 client forks.

Engine strategy: Arrow-batched pandas_udf; each batch sieves the ~3,400
primes below √max once (cached per worker) and tests divisibility with
one vectorized outer-mod — trial division by primes only, not by every
integer like the reference's mapper (Simple.pm:897-907).

Usage: python tools/prime_bench.py
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np  # noqa: F401  (resolves postponed pandas_udf type hints)
import pandas as pd  # noqa: F401

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

LO = 1_000_000_001
HI = 1_000_300_001  # exclusive → 300,000 candidates, ≙ the POD's range


def main() -> None:
    import numpy as np
    import pandas as pd
    from pyspark.sql import functions as F
    from pyspark.sql import types as T
    from mapreduce_framework_simple_spark.session import get_session

    spark = get_session("prime-bench")
    spark.sparkContext.setLogLevel("ERROR")

    @F.pandas_udf(T.BooleanType())
    def is_prime(s: pd.Series) -> pd.Series:
        import math

        import numpy as np

        n = s.to_numpy(dtype=np.int64)
        if len(n) == 0:
            return pd.Series(np.zeros(0, dtype=bool))
        lo, hi = int(n.min()), int(n.max())
        # prime sieve up to sqrt(max) — ~31.6k cells, ~3.4k primes
        limit = math.isqrt(hi) + 1
        sieve = np.ones(limit + 1, dtype=bool)
        sieve[:2] = False
        for p in range(2, math.isqrt(limit) + 1):
            if sieve[p]:
                sieve[p * p:: p] = False
        primes = np.nonzero(sieve)[0].astype(np.int64)
        span = hi - lo + 1
        if span <= 8 * len(n) + 1024:
            # spark.range batches are contiguous spans: segmented sieve
            # (O(span · Σ 1/p) marking ops ≈ 3 per candidate) instead of
            # ~3.4k trial mods per candidate — round-12 optimization,
            # same kernel as q61 (functions/udfs.py), equality-tested
            seg = np.ones(span, dtype=bool)
            for p in primes.tolist():
                start = max(p * p, ((lo + p - 1) // p) * p)
                if start <= hi:
                    seg[start - lo:: p] = False
            out = seg[n - lo]
        else:
            # sparse batch: blocked outer-mod keeps temporaries bounded;
            # the n==p guard only matters when a candidate can BE a sieve
            # prime (n ≤ √max); skip the second comparison array otherwise
            out = np.ones(len(n), dtype=bool)
            block = 512
            overlap = lo <= int(primes[-1]) if len(primes) else False
            for i in range(0, len(primes), block):
                pb = primes[i : i + block]
                nz = n[:, None] % pb[None, :] != 0
                if overlap:
                    nz |= n[:, None] == pb[None, :]
                out &= nz.all(axis=1)
        return pd.Series(out & (n >= 2))

    spark.range(1, 1000).withColumnRenamed("id", "n").where(is_prime(F.col("n"))).count()  # warm workers

    # same pinned CPU anchor as bench.py, timed right before the
    # measurement: cross-round prime-bench figures (1.6 s one round,
    # 4.6-5.5 s the next, identical code) are only interpretable next
    # to the box's concurrent multi-core throughput. Gated like the
    # bench: a contended reading re-measures (bounded) rather than
    # timing the workload under a transient the artifact then has to
    # explain away.
    import bench as _bench

    calib_1t, calib_mt, _ = _bench.calibrate_gated()

    t0 = time.perf_counter()
    row = (
        spark.range(LO, HI)
        .withColumnRenamed("id", "n")
        .where(is_prime(F.col("n")))
        .agg(F.sum("n").alias("prime_sum"), F.count("*").alias("n_primes"))
        .collect()[0]
    )
    dt = time.perf_counter() - t0
    # stamped at 6 dp and wall_normalized computed FROM the stamped
    # value, so wall/ratio recomputed from this line reproduces it
    ratio = round(calib_mt / _bench.CALIB_REF_32T_S, 6)
    print(f"prime_sum={row['prime_sum']} n_primes={row['n_primes']} wall={dt:.2f}s "
          f"(reference: ~60s serial, ~10s on ~40 remote cores) "
          f"calibration_1t={calib_1t:.3f}s calibration_32t={calib_mt:.3f}s "
          f"(refs {_bench.CALIB_REF_1T_S}/{_bench.CALIB_REF_32T_S}, "
          f"ratio_32t={ratio:.6f}, wall_normalized={dt / ratio:.2f}s)")


if __name__ == "__main__":
    main()
