"""The reference model DAG ported as DataFrame builders.

One module per reference layer (SURVEY.md §0 DAG):

- ``sources``     — 11 thin ingest/static models (``models/source/**``)
- ``poms``        — ``utils/poms_flattened``
- ``streams``     — ``intermediary/atinternet_smarttag_streams_daily_v4``
- ``reporting``   — six ``integral_reporting_*`` marts + the dashboard

Importing this package registers every model in ``registry.MODELS``.
"""

from __future__ import annotations


def load_all() -> None:
    from . import sources  # noqa: F401
    from . import poms  # noqa: F401
    from . import streams  # noqa: F401
    from . import reporting  # noqa: F401
