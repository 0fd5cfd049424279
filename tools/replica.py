"""Shared N× corpus-replica builder for the probe tools (scale_probe,
router_probe) — offset-key replication plus an atomic completion marker.

One copy of both pieces the probes used to duplicate:

* ``replicate_table``: the offset-replicate-and-union recipe (join keys
  shifted 10^9 per replica so join fan-out stays realistic);
* ``ensure_replica``: completion-marker guard. A build killed mid-write
  (OOM, Ctrl-C) used to leave a partial dataset that every later probe
  run silently reused — the old guard was ``os.path.isdir(dst)``, which
  is satisfied the moment the first write starts. The marker is written
  only after the build callback returns (i.e. every table landed), and
  a marker-less existing dir is torn down and rebuilt.
"""

from __future__ import annotations

import os
import shutil
from functools import reduce

MARKER = "_MFSS_COMPLETE"


def replicate_table(df, key: str, n: int):
    """Union ``n`` copies of ``df`` with ``key`` offset 10^9 per replica."""
    from pyspark.sql import functions as F

    return reduce(
        lambda a, b: a.unionAll(b),
        [df.withColumn(key, F.col(key) + F.lit(i * 10**9)) for i in range(n)],
    )


def ensure_replica(dst: str, build) -> str:
    """Run ``build(dst)`` unless a completed replica already sits at
    ``dst``; tear down partial leftovers from a killed earlier run."""
    marker = os.path.join(dst, MARKER)
    if os.path.exists(marker):
        return dst
    if os.path.isdir(dst):
        shutil.rmtree(dst)  # partial build: dir exists but marker absent
    os.makedirs(dst)
    build(dst)
    with open(marker, "w") as fh:
        fh.write("")
    return dst
