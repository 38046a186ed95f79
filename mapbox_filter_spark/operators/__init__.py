from .style_ops import (
    keep_predicate,
    neg_predicate,
    prune_props,
    filter_keep,
    filter_neg,
)
from .assemble import assign_tiles, assemble_tiles

__all__ = [
    "keep_predicate",
    "neg_predicate",
    "prune_props",
    "filter_keep",
    "filter_neg",
    "assign_tiles",
    "assemble_tiles",
]
