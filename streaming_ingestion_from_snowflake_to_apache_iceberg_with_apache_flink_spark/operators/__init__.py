from . import curation, dedup, multimodal, similarity, temporal, text
from .merge import merge_upsert, overwrite_partition
from .pagination import highwater_increment, page, pages_union, ranked
from .sessions import session_stats, sessionize
from .shards import distinct_shards, new_shards, shard_filter
from .topn import partitioned_layout, shard_fanout_topn

__all__ = [
    "distinct_shards",
    "shard_filter",
    "new_shards",
    "ranked",
    "page",
    "pages_union",
    "highwater_increment",
    "merge_upsert",
    "overwrite_partition",
    "shard_fanout_topn",
    "partitioned_layout",
    "sessionize",
    "session_stats",
]
