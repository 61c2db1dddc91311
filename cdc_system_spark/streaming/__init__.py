from cdc_system_spark.streaming.ann import StreamingAnnIngestor
from cdc_system_spark.streaming.ingest import (
    StreamingCorpusIngestor,
    corpus_content_overlap,
)
from cdc_system_spark.streaming.replicator import StreamingReplicator
from cdc_system_spark.streaming.source import read_change_stream

__all__ = [
    "StreamingAnnIngestor",
    "StreamingCorpusIngestor",
    "StreamingReplicator",
    "corpus_content_overlap",
    "read_change_stream",
]
