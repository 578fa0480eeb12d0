"""Round-15 pins: the full dedup scorecard's memo must be a pure
cache (same rows warm as cold, distinct corpora keyed apart — the
_FULL_RECALL_CACHE twin of the r14 sampled-scorecard pins), and the
Matryoshka funnel (X191) must agree with the exact full-dimension
search whenever the truncated-prefix coarse stage recalls the true
top-k."""

from __future__ import annotations

from employee_data_management_system_data_engineering_solution_spark.plans import llm
from employee_data_management_system_data_engineering_solution_spark.plans.registry import REGISTRY

SF_SMOKE = "/root/testdata/sf0.001"


def _sorted_rows(df):
    return sorted(tuple(r) for r in df.collect())


# ---------------------------------------------------------------------------
# _FULL_RECALL_CACHE (r14 verdict ask 3)
# ---------------------------------------------------------------------------
def test_full_scorecard_warm_read_is_identical(spark):
    """The memo is a pure cache: a cold pass and a warm pass on the
    same corpus return identical rows, and the warm pass reuses the
    checkpointed frames (one cache entry per corpus)."""
    llm.clear_full_recall_cache()
    fn = REGISTRY["dedup_recall_report"].fn
    cold = _sorted_rows(fn(spark, SF_SMOKE))
    assert len(llm._FULL_RECALL_CACHE) == 1
    warm = _sorted_rows(fn(spark, SF_SMOKE))
    assert len(llm._FULL_RECALL_CACHE) == 1
    assert cold == warm
    llm.clear_full_recall_cache()
    assert not llm._FULL_RECALL_CACHE


def test_full_scorecard_cache_keys_by_corpus(spark, tmp_path):
    """Two different corpora must not share frames: a 3-doc planted
    corpus after a real-smoke pass gets its own entry, its own truth
    (exactly the one verbatim-duplicate pair), and full recall on it
    from every detector."""
    llm.clear_full_recall_cache()
    fn = REGISTRY["dedup_recall_report"].fn
    fn(spark, SF_SMOKE).collect()
    rows = [
        (1, "the quick brown fox jumps over the lazy dog " * 4, "web"),
        (2, "the quick brown fox jumps over the lazy dog " * 4, "web"),
        (3, "completely unrelated text about parquet row groups", "web"),
    ]
    spark.createDataFrame(
        rows, "doc_id LONG, text STRING, source STRING"
    ).write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
    small = fn(spark, str(tmp_path)).collect()
    assert len(llm._FULL_RECALL_CACHE) == 2
    assert all(r["n_true"] == 1 and r["n_hit"] == 1 for r in small)
    llm.clear_full_recall_cache()
