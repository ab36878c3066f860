"""Parallelism-invariance (SURVEY §5 / §7.3 hard part 5): the same inputs
must produce byte-identical sorted outputs at two parallelism levels —
the determinism that makes the N-vs-4N scaling comparison meaningful and
keeps violation sets reproducible on a real cluster.

Each level runs in its OWN subprocess/JVM (a SparkSession's master cannot
change in-process), with different core counts AND different (odd vs even)
shuffle-partition counts to shake out any partitioning-order dependence.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = """
import hashlib, json, sys
sys.path.insert(0, {repo!r})
import __spark_entry__ as em
from nospa_rdf_data_cube_validator_spark.session import get_spark

master, parts = sys.argv[1], int(sys.argv[2])
spark = get_spark(app_name=f"det-{{master}}", master=master, shuffle_partitions=parts)
qs = em.queries()
digests = {{}}
for name in ("kg_triples", "dedup_minhash", "embedding_near_pairs",
             "cube_ic12", "events_sessionize", "text_winnow"):
    df = qs[name](spark, "/root/testdata/sf0.001")
    rows = sorted(tuple(r) for r in df.collect())
    digests[name] = hashlib.md5(repr(rows).encode()).hexdigest()
print("DIGESTS " + json.dumps(digests))
"""


def _run(master: str, parts: int) -> dict:
    env = dict(os.environ)
    env.setdefault("SPARK_DRIVER_MEM", "4g")
    out = subprocess.run(
        [sys.executable, "-c", WORKER.format(repo=REPO), master, str(parts)],
        capture_output=True,
        text=True,
        timeout=900,
        env=env,
    )
    lines = [ln for ln in out.stdout.splitlines() if ln.startswith("DIGESTS ")]
    assert lines, f"worker {master} produced no digests:\n{out.stderr[-2000:]}"
    return json.loads(lines[-1].removeprefix("DIGESTS "))


def test_outputs_identical_across_parallelism_levels():
    low = _run("local[2]", 3)
    high = _run("local[8]", 8)
    diff = {k: (low[k], high[k]) for k in low if low[k] != high.get(k)}
    assert not diff, f"parallelism-dependent outputs: {diff}"
