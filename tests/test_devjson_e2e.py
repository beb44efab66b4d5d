"""The reference's own 75-case benchmark (eval/data/dev.json) end-to-end:
setup_sql -> query -> ddb_benchmark_result -> validation_sql, our engine vs
DuckDB oracle per case (protocol of /root/reference/eval/evaluate.py:116-170).
See harness/devjson.py for the loose-comparison cases (sampling, SUMMARIZE
stats, EXPLAIN text, version strings); HTTP-source cases run against a
loopback fixture server.

Set SPARK_GRAFT_SKIP_DEVJSON=1 to skip the ~4 min run locally.
"""

import os

import pytest

from harness import devjson


@pytest.mark.skipif(
    os.environ.get("SPARK_GRAFT_SKIP_DEVJSON") == "1",
    reason="SPARK_GRAFT_SKIP_DEVJSON=1",
)
def test_devjson_all_cases(spark, tmp_path):
    results = devjson.run_all(spark, str(tmp_path))
    bad = [r for r in results if r.status not in ("ok", "skip")]
    msg = "; ".join(f"[{r.idx}] {r.db_id} {r.status}: {r.detail}" for r in bad)
    assert not bad, msg
    ran = [r for r in results if r.status != "skip"]
    assert len(ran) == 75
