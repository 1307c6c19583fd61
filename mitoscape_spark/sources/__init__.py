"""Ingest adapters: alignment parquet (native), BAM via pysam (gated
stub), multimodal binary columns with typed metadata."""
