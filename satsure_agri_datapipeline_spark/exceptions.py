"""Component exception domains (reference parity:
``src/utils/exceptions.py``, wrapped per stage at ``ingestion.py:106-108``,
``transformation.py``, ``validation.py``, ``loading.py``).

Each pipeline stage wraps unexpected failures in its domain error so callers
can catch per-stage (retry ingest, alert on load, fail fast on config)
without string-matching Spark's exception zoo. The original exception is
always chained (``raise ... from e``)."""

from __future__ import annotations


class PipelineError(Exception):
    """Base for all pipeline-domain errors."""


class IngestionError(PipelineError):
    """Discovery / schema gate / read failures."""


class TransformationError(PipelineError):
    """Clean / impute / calibrate / derive failures."""


class ValidationError(PipelineError):
    """Quality-metric computation or report failures."""


class LoadingError(PipelineError):
    """Partitioned write / metadata sink failures."""


class ConfigurationError(PipelineError):
    """Invalid or missing configuration."""
