"""Ingest adapters and data-layout writers: alignment parquet (native),
SAM text via a Spark 4 Python data source, BAM via pysam (gated),
multimodal binary columns with typed metadata, bucketed tables
(shuffle-free joins), hive-partitioned layout (partition pruning)."""
