from .temporal import (
    asof_join,
    chunked_asof_join,
    dedup_keep_first,
    ffill,
    gap_fill_bounded,
    interval_filter,
    mode_per_group,
    resample_ticks,
    rolling_mean,
    sessionize,
    state_changes,
    top1_per_group,
)

__all__ = [
    "asof_join",
    "chunked_asof_join",
    "dedup_keep_first",
    "ffill",
    "gap_fill_bounded",
    "interval_filter",
    "mode_per_group",
    "resample_ticks",
    "rolling_mean",
    "sessionize",
    "state_changes",
    "top1_per_group",
]
