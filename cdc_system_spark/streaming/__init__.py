from cdc_system_spark.streaming.ingest import StreamingCorpusIngestor
from cdc_system_spark.streaming.replicator import StreamingReplicator
from cdc_system_spark.streaming.source import read_change_stream

__all__ = ["StreamingCorpusIngestor", "StreamingReplicator", "read_change_stream"]
