"""Training-data pipeline operator queries (dedup / similarity / text /
multimodal) — populated alongside getdbt_spark.pipeline."""

from __future__ import annotations
