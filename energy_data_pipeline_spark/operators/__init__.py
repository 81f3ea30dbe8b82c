from . import dedup, densify, gaps, impute, neardup, reshape, rollup, similarity, topk

__all__ = [
    "dedup",
    "densify",
    "gaps",
    "impute",
    "neardup",
    "reshape",
    "rollup",
    "similarity",
    "topk",
]
