"""Time the bench's operator-query list (bench.py methodology: one session,
noop sink, release_intermediates between queries) without touching the
frozen bench.py. Usage:
  python scripts/opq_sweep.py [sf_dir] [query ...]
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf1.0"


def main() -> None:
    from xoverrr_spark.session import get_spark

    import __spark_entry__ as entrymod
    from bench import OPERATOR_QUERY_NAMES, _noop_write
    from xoverrr_spark.operators.dedup import release_intermediates

    names = sys.argv[2:] or OPERATOR_QUERY_NAMES
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("opq_sweep", cores=cpus, shuffle_partitions=max(cpus, 8),
                      extra_conf={"spark.sql.files.maxPartitionBytes": str(1024 * 1024)})
    qs = entrymod.queries()
    out = {}
    print("loadavg:", os.getloadavg()[0])
    for name in names:
        t0 = time.time()
        df = qs[name](spark, SF_DIR)
        _noop_write(df)
        out[name] = round(time.time() - t0, 3)
        release_intermediates(df)
        print(f"{name}: {out[name]}")
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
