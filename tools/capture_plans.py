"""Capture .explain("formatted") for named registry queries (and the
bench amplified topologies) into plans/$SPARK_GRAFT_PLANS_ROUND
(default r14)/<name>_<tag>.txt.

Usage: python tools/capture_plans.py <tag> [name ...]
With no names: the 10 headline queries + amplified topologies.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

HEADLINE = [
    "flagship_words",
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_region_revenue",
    "window_running_sum",
    "sessionize_events",
    "dedup_minhash_lsh",
    "text_quality_score",
    "ann_bruteforce_topk",
    "corpus_curation",
    "embedding_gram_matrix",
    "dedup_jaccard_prefix_filter",
]


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:] or HEADLINE
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        os.environ.get("SPARK_GRAFT_PLANS_ROUND", "r14"),
    )
    os.makedirs(out_dir, exist_ok=True)

    from tiny_etl_multiproc_bigdata_spark.session import get_spark
    from tiny_etl_multiproc_bigdata_spark.plans.registry import queries

    spark = get_spark(app_name="capture-plans")
    q = queries()
    for name in names:
        df = q[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({len(plan)} chars)")


if __name__ == "__main__":
    main()
