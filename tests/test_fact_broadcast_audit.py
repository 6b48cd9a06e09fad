"""CI audit: no registered query may broadcast a raw fact-table scan.

The q4_order_priority trap (BASELINE.md): at small scale factors,
Catalyst's size statistics put a narrow projection of a FACT table under
the broadcast threshold, and AQE happily builds a BroadcastExchange over
it at runtime. The plan "works" locally and is fatal on a cluster where
the fact is TBs. This test generalizes the one-off round-1 audit script:
every batch query's plan -- both the static plan and the AQE-finalized
post-execution plan -- is walked for a BroadcastExchange whose subtree
scans a fact table raw (no aggregate below the exchange).

sf0.001 is deliberately the audit scale: the smaller the stats, the more
eagerly Catalyst broadcasts, so small-SF is the *most* adversarial input
for this property. A query that stays shuffle-planned here stays
shuffle-planned at every larger scale.

Fixes are per-query ``.hint("merge")`` on the fact side (q4, join_semi,
join_anti, join_left_outer, subquery_exists, subquery_in) -- a hint, not
a session-wide broadcast threshold of -1, so legitimate dim broadcasts
keep happening.
"""

from __future__ import annotations

import pytest

from os___mapreduceframework_spark.plans.audit import raw_fact_broadcasts
from os___mapreduceframework_spark.queries import queries

from conftest import TEST_SF_DIR

# Tables that are fact-scale at 100 TB. "orders.parquet" (not "orders")
# avoids matching o_order* column names in plan text.
FACTS = ("lineitem", "orders.parquet", "events", "documents", "embeddings")

# Broadcasts of a *bounded* subset of a fact are legitimate at any
# scale; each entry documents why the broadcast side cannot grow with
# the corpus.
ALLOWED = {
    # query set is `vec_id < N_QUERIES`: constant row count by construction
    "ann_bruteforce_topk",
    "ann_lsh_topk",
    "ann_lsh_multiprobe_topk",
    "ann_filtered_topk",
    # broadcast side is the IVF centroid set (fixed k) + bounded queries
    # (the corpus-assignments join itself is merge-hinted in ivf_topk)
    "ann_ivf_topk",
    "ann_ivf_sampled_topk",
    # broadcast side is the right-HOT row slice, promoted only when the
    # sketch estimates it under HOT_BROADCAST_ROWS_MAX rows; above the
    # bound the hot branch becomes a salted shuffle join instead
    # (operators/scale.py hot_isolated_join size guard + its unit test)
    "hot_isolated_join_agg",
}

# Streaming queries spin up a stream per invocation (~seconds each) and
# join only dimension tables on their static sides; they are exercised
# by the streaming tests instead.
_BATCH = sorted(
    n for n in queries() if not n.startswith("stream_")
)


@pytest.mark.parametrize("name", _BATCH)
def test_no_raw_fact_broadcast(spark, name):
    """STATIC-plan audit only, deliberately: a Catalyst-planned
    broadcast is based on ESTIMATED file statistics, which is exactly
    the small-SF trap (tiny estimates at test scale, TBs in
    production). An AQE runtime conversion, by contrast, fires only
    after the build side's shuffle has MATERIALIZED under the
    threshold -- evidence-based and therefore scale-safe: the same
    query at 100 TB materializes TBs and never converts. Flagging
    those would punish a correct adaptive optimization."""
    if name in ALLOWED:
        pytest.skip("documented bounded-subset broadcast")
    df = queries()[name](spark, TEST_SF_DIR)
    offenders = set(raw_fact_broadcasts(df, FACTS))
    assert not offenders, (
        f"{name} statically broadcasts raw fact scan(s) {sorted(offenders)}; "
        "add .hint('merge') on the fact side or justify in ALLOWED"
    )
