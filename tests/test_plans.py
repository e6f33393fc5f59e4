"""Physical-plan assertions: the optimizations the engine is designed
around must actually appear in the executed plan, not just in comments.

- postings/term_stats scans prune to the query terms' term_bucket
  partitions (PartitionFilters) and push `term IN (...)` into parquet
  (PushedFilters);
- the positions column is pruned out of BM25 scans (ReadSchema);
- term stats join is a broadcast hash join (no shuffle of postings for
  the join);
- exactly ONE exchange (the doc_id aggregation) in the scoring plan;
- top-k compiles to TakeOrderedAndProject, not a global sort.
"""

import pytest


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(scope="module")
def scores_plan(spark, index_small):
    from gopensearch_spark.search import bm25_scores

    return _plan(bm25_scores(spark, index_small, ["spark", "join"], mode="or"))


def test_partition_pruning_and_pushdown(scores_plan):
    assert "PartitionFilters: [term_bucket" in scores_plan.replace("#", " #").replace("  ", " ") or \
           "PartitionFilters: [term_bucket" in scores_plan
    assert "PushedFilters: [In(term" in scores_plan


def test_positions_column_pruned(scores_plan):
    # BM25 never reads position bytes; parquet projection must drop them
    assert "positions" not in scores_plan


def test_broadcast_join_and_single_shuffle(scores_plan):
    assert "BroadcastHashJoin" in scores_plan
    # one data exchange (doc_id agg); broadcast exchanges don't shuffle data
    n_exchanges = scores_plan.count("Exchange hashpartitioning")
    assert n_exchanges == 1, scores_plan


def test_topk_is_take_ordered(spark, index_small):
    from gopensearch_spark.search import bm25_match

    plan = _plan(bm25_match(spark, index_small, ["spark", "join"], k=10, mode="or"))
    assert "TakeOrderedAndProject" in plan


def test_wand_serving_path_reads_blocks_only(spark, index_small):
    """The entry/serving bm25_* queries route through the compressed
    block index: the scan must read blocks (never flat postings), with
    term_bucket pruning + term IN pushdown, ending in a global top-k."""
    from gopensearch_spark.search import wand_match

    plan = _plan(wand_match(spark, index_small, ["spark", "join"], k=10, mode="or"))
    assert "/blocks" in plan
    assert "/postings" not in plan, plan
    assert "PushedFilters: [In(term" in plan
    assert "PartitionFilters: [term_bucket" in plan or "term_bucket#" in plan
    assert "TakeOrderedAndProject" in plan


def test_prefix_scan_prunes_buckets_via_term_dict(spark, index_small):
    """Prefix queries resolve against the sorted term dictionary first,
    so the postings scan is partition-pruned to the matching terms'
    buckets (the hash layout alone cannot prune a prefix) with the
    StartsWith pushed to parquet."""
    from gopensearch_spark.search import prefix_match

    plan = _plan(prefix_match(spark, index_small, "dat", k=10))
    assert "term_bucket#" in plan.split("PartitionFilters:", 1)[1].split("]", 1)[0], plan
    assert "StringStartsWith(term,dat)" in plan
    # unmatched prefix short-circuits to an empty relation, no scan job
    assert prefix_match(spark, index_small, "zzzzqq", k=5).count() == 0
