#!/usr/bin/env python
"""Time every declared query (driver-mimic) with the noop sink.

Optimization-round instrumentation (guide §1.4): runs each
``__spark_entry__.queries()`` entry against $SPARK_GRAFT_SF_DIR and
times the computation via the noop sink, printing one JSON line per
query.  Not part of the driver contract; used to rank operators by
cost and to spot pathological plans.

    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.01 SPARK_GRAFT_CPUS=8 \
        python scripts/time_queries.py [name ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", 8))


def main() -> None:
    import __spark_entry__ as entry
    from mircv_project_spark.session import get_spark

    spark = get_spark(
        f"mircv-timeq-{CPUS}", master=f"local[{CPUS}]",
        shuffle_partitions=CPUS * 2,
    )
    qs = entry.queries()
    only = set(sys.argv[1:])
    total = 0.0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        spark.sparkContext.setJobDescription(f"q:{name}")
        t0 = time.monotonic()
        err = None
        try:
            fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
        except Exception as e:  # noqa: BLE001 - report and continue
            err = f"{type(e).__name__}: {e}"[:200]
        dt = time.monotonic() - t0
        total += dt
        print(json.dumps({"q": name, "s": round(dt, 2), "err": err}), flush=True)
    print(json.dumps({"q": "_total", "s": round(total, 1)}), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
