"""Driver-job-count probe for the snapshot CoW merge path: builds a tiny
3-file table, runs one commit_merge that partially matches one file, and
prints how many Spark jobs each phase scheduled.  The optimization rounds
use this to verify job-count claims (the per-job fixed cost dominates
micro-batch/commit wall time on the local harness — guide §1/§5).

Usage: python tools/merge_job_count.py
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bigdata_homed_spark.session import get_spark
from bigdata_homed_spark.sources.snapshots import SnapshotTable


def main() -> None:
    spark = get_spark("merge_job_count")
    spark.range(1_000_000).selectExpr("sum(id)").collect()  # JVM warm-up
    tr = spark.sparkContext._jsc.sc().statusTracker()

    def njobs() -> int:
        return len(tr.getJobIdsForGroup(None))

    for name in [
        "_write_data_files",
        "_trim_dvs",
        "_publish",
        "pruned_entries",
        "_run_maintenance_jobs",
        "_scan_flat_live",
    ]:
        orig = getattr(SnapshotTable, name)

        def mk(orig, name):
            def wrapped(*a, **k):
                before = njobs()
                t0 = time.time()
                r = orig(*a, **k)
                print(f"    {name}: +{njobs() - before} jobs  {time.time() - t0:.2f}s")
                return r

            return wrapped

        setattr(SnapshotTable, name, mk(orig, name))

    d = tempfile.mkdtemp()
    t = SnapshotTable(os.path.join(d, "t"))
    base = spark.range(0, 1000).selectExpr("id as k", "id*2 as v")
    t.commit_append(base, stats_cols=["k"])
    upd = spark.range(100, 200).selectExpr("id as k", "id*7 as v")
    print("=== commit_merge ===")
    before = njobs()
    t.commit_merge(upd, key="k", stats_cols=["k"])
    print(f"TOTAL: {njobs() - before}")


if __name__ == "__main__":
    main()
