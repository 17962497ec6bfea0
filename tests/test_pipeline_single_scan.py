"""Single-scan discipline for the composite pipelines (operators/pipeline.py).

Each composite composes 3+ component operators that would naively each
re-scan the ``documents`` parquet — 3× corpus I/O at 100 TB. The entry
points persist the shared corpus frame instead, so the optimized plan must
contain ZERO direct parquet relations (every consumer reads the
InMemoryRelation) and the cache chain must bottom out in exactly one
parquet scan of ``documents``.
"""

from __future__ import annotations

import re

from parquet_near_storage_compute_spark.operators.pipeline import QUERIES


def _leaf_parquet_scans(jplan, acc):
    """Walk a logical plan; recurse into InMemoryRelation cached plans."""
    name = jplan.nodeName()
    if name == "InMemoryRelation":
        inner = jplan.cacheBuilder().logicalPlan()
        _leaf_parquet_scans(inner, acc)
    elif "Relation" in name or "LogicalRelation" in name:
        s = jplan.toString().splitlines()[0]
        if "parquet" in s:
            acc.append(s)
    ch = jplan.children()
    for i in range(ch.size()):
        _leaf_parquet_scans(ch.apply(i), acc)
    return acc


def test_composites_read_documents_once(spark, sf_dir):
    for name, fn in QUERIES.items():
        df = fn(spark, sf_dir)
        plan = df._jdf.queryExecution().optimizedPlan()
        top = plan.toString()
        assert not re.search(r"Relation.*parquet", top), (
            f"{name}: direct parquet scan outside the cache:\n{top}"
        )
        assert "InMemoryRelation" in top, f"{name}: corpus frame not cached"
        scans = _leaf_parquet_scans(plan, [])
        docs_scans = {s for s in scans if "documents" in s}
        assert len(docs_scans) <= 1, (
            f"{name}: documents scanned {len(docs_scans)} distinct ways:\n"
            + "\n".join(docs_scans)
        )
        # the composite still computes the right thing end to end
        assert df.count() > 0
