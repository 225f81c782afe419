"""Operator library — the SURVEY.md §2 contract as reusable, composable
DataFrame transforms. Each function is lazy (returns a new DataFrame; nothing
executes until an action), so Catalyst optimizes across operator boundaries.
"""

from crossbar_data_process_spark.operators.aggregates import (
    agg_median,
    agg_middle_row,
    conflict_resolve,
    pipe_union_agg,
    tf_effect_resolve,
)
from crossbar_data_process_spark.operators.dedup import (
    dedup_exact,
    dedup_undirected,
    keep_best,
)
from crossbar_data_process_spark.operators.filters import (
    anti_filter,
    blacklist_filter,
    drop_self_pairs,
    semi_filter,
)
from crossbar_data_process_spark.operators.mapping import broadcast_map, fallback_map
from crossbar_data_process_spark.operators.merge import CoalesceSpec, outer_merge
from crossbar_data_process_spark.operators.topk import top_k_per_group

__all__ = [
    "CoalesceSpec",
    "agg_median",
    "agg_middle_row",
    "anti_filter",
    "blacklist_filter",
    "broadcast_map",
    "conflict_resolve",
    "dedup_exact",
    "dedup_undirected",
    "drop_self_pairs",
    "fallback_map",
    "keep_best",
    "outer_merge",
    "pipe_union_agg",
    "semi_filter",
    "tf_effect_resolve",
    "top_k_per_group",
]
