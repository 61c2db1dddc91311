from cdc_system_spark.streaming.replicator import StreamingReplicator
from cdc_system_spark.streaming.source import read_change_stream

__all__ = ["StreamingReplicator", "read_change_stream"]
