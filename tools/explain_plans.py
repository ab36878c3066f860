"""Print formatted physical plans for the hot paths; used to verify that
- parquet scans carry PushedFilters/ReadSchema pruning,
- metadata joins are BroadcastHashJoin,
- observation-scale aggregations stay in WholeStageCodegen,
- no accidental CartesianProduct / per-row UDF appears.

Usage: python tools/explain_plans.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as em
from nospa_rdf_data_cube_validator_spark.session import get_spark


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark(master="local[4]", shuffle_partitions=8)
    qs = em.queries()
    for name in ("ic12_duplicates", "path_join", "kg_triples", "ann_topk", "dedup_exact"):
        print(f"\n{'=' * 70}\n{name}\n{'=' * 70}")
        df = qs[name](spark, sf_dir)
        df.explain("formatted")


if __name__ == "__main__":
    main()
