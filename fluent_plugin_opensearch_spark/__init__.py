"""fluent_plugin_opensearch_spark — a PySpark-native log/telemetry
pipeline (parse → enrich → route → aggregate) with the record-processing
semantics of fluent-plugin-opensearch, rebuilt Spark-first.

See SURVEY.md for the reference analysis; public surface below.
"""

from .config import PipelineConfig, strftime_to_spark
from .plans.pipeline import CheckpointManifest, build, run_batch, split_streams
from .session import get_spark
from .sinks.writer import SinkCatalog, append_to_sink, merge_write
from .sources.transcripts import (
    ORACLE_PREFIX,
    TRANSCRIPTS_SQL,
    load_transcripts,
    synthesize_transcripts,
)

__all__ = [
    "PipelineConfig",
    "strftime_to_spark",
    "get_spark",
    "build",
    "run_batch",
    "split_streams",
    "CheckpointManifest",
    "SinkCatalog",
    "append_to_sink",
    "merge_write",
    "load_transcripts",
    "synthesize_transcripts",
    "TRANSCRIPTS_SQL",
    "ORACLE_PREFIX",
]

__version__ = "0.1.0"
