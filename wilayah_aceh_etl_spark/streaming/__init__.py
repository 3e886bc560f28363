from wilayah_aceh_etl_spark.streaming.windows import (
    enriched_segment_counts,
    read_event_stream,
    session_counts,
    sliding_rates,
    tumbling_counts,
)
from wilayah_aceh_etl_spark.streaming.stateful import (
    dedup_exact_replay,
    dedup_first_per_key,
    running_user_ewma,
    running_user_totals,
)
from wilayah_aceh_etl_spark.streaming.joins import (
    click_purchase_attribution,
    click_purchase_attribution_outer,
)

__all__ = [
    "click_purchase_attribution",
    "click_purchase_attribution_outer",
    "enriched_segment_counts",
    "read_event_stream",
    "tumbling_counts",
    "sliding_rates",
    "session_counts",
    "dedup_exact_replay",
    "dedup_first_per_key",
    "running_user_ewma",
    "running_user_totals",
]
